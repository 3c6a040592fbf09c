"""Checkpoint import/export tests.

The oracle below is an independent functional-torch implementation of the
published DiT forward pass (patchify conv -> adaLN-Zero blocks -> final
layer), driven directly by a reference-style state_dict. Importing that same
state_dict into our flax DiT must reproduce its output to fp32 tolerance —
this pins the name mapping, the qkv fused layout, the conv->dense patch
flatten order, and the adaLN chunk order all at once.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from fast_dit_tpu.ckpt import (  # noqa: E402
    flax_to_state_dict,
    import_dit_checkpoint,
    load_torch_checkpoint,
    state_dict_to_flax,
)
from fast_dit_tpu.models import DiT, get_2d_sincos_pos_embed  # noqa: E402

# tiny config
DEPTH, D, HEADS, P, IMG, C, NCLS = 2, 32, 4, 2, 8, 4, 10
MLP_H = 4 * D


def make_state_dict(seed=0):
    """Random reference-style state dict (names as in the published DiT)."""
    rs = np.random.RandomState(seed)
    sd = {}

    def w(*shape, scale=0.2):
        return rs.randn(*shape).astype(np.float32) * scale

    sd["x_embedder.proj.weight"] = w(D, C, P, P)
    sd["x_embedder.proj.bias"] = w(D)
    sd["t_embedder.mlp.0.weight"] = w(D, 256)
    sd["t_embedder.mlp.0.bias"] = w(D)
    sd["t_embedder.mlp.2.weight"] = w(D, D)
    sd["t_embedder.mlp.2.bias"] = w(D)
    sd["y_embedder.embedding_table.weight"] = w(NCLS + 1, D)
    for i in range(DEPTH):
        sd[f"blocks.{i}.adaLN_modulation.1.weight"] = w(6 * D, D)
        sd[f"blocks.{i}.adaLN_modulation.1.bias"] = w(6 * D)
        sd[f"blocks.{i}.attn.qkv.weight"] = w(3 * D, D)
        sd[f"blocks.{i}.attn.qkv.bias"] = w(3 * D)
        sd[f"blocks.{i}.attn.proj.weight"] = w(D, D)
        sd[f"blocks.{i}.attn.proj.bias"] = w(D)
        sd[f"blocks.{i}.mlp.fc1.weight"] = w(MLP_H, D)
        sd[f"blocks.{i}.mlp.fc1.bias"] = w(MLP_H)
        sd[f"blocks.{i}.mlp.fc2.weight"] = w(D, MLP_H)
        sd[f"blocks.{i}.mlp.fc2.bias"] = w(D)
    sd["final_layer.adaLN_modulation.1.weight"] = w(2 * D, D)
    sd["final_layer.adaLN_modulation.1.bias"] = w(2 * D)
    sd["final_layer.linear.weight"] = w(P * P * 2 * C, D)
    sd["final_layer.linear.bias"] = w(P * P * 2 * C)
    sd["pos_embed"] = get_2d_sincos_pos_embed(D, IMG // P).astype(np.float32)[None]
    return sd


def torch_oracle_forward(sd, x_np, t_np, y_np):
    """Functional-torch DiT forward from the state dict (independent oracle)."""
    g = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(x_np)
    t = torch.from_numpy(t_np)
    y = torch.from_numpy(y_np)

    # patchify: conv stride=P + flatten to tokens, + frozen pos embed
    tok = F.conv2d(x, g["x_embedder.proj.weight"], g["x_embedder.proj.bias"], stride=P)
    tok = tok.flatten(2).transpose(1, 2) + g["pos_embed"]

    # timestep embedding: [cos | sin] frequency features -> MLP
    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    tf = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = F.linear(tf, g["t_embedder.mlp.0.weight"], g["t_embedder.mlp.0.bias"])
    temb = F.linear(F.silu(temb), g["t_embedder.mlp.2.weight"], g["t_embedder.mlp.2.bias"])
    c = temb + g["y_embedder.embedding_table.weight"][y]

    def ln(v):
        return F.layer_norm(v, (D,), eps=1e-6)

    for i in range(DEPTH):
        mods = F.linear(F.silu(c), g[f"blocks.{i}.adaLN_modulation.1.weight"],
                        g[f"blocks.{i}.adaLN_modulation.1.bias"]).chunk(6, dim=1)
        s_msa, sc_msa, gate_msa, s_mlp, sc_mlp, gate_mlp = mods
        h = ln(tok) * (1 + sc_msa[:, None]) + s_msa[:, None]
        qkv = F.linear(h, g[f"blocks.{i}.attn.qkv.weight"], g[f"blocks.{i}.attn.qkv.bias"])
        B, N, _ = qkv.shape
        qkv = qkv.reshape(B, N, 3, HEADS, D // HEADS)
        q, k, v = qkv.unbind(2)  # (B, N, H, hd)
        q, k, v = (u.permute(0, 2, 1, 3) for u in (q, k, v))
        att = torch.softmax(q @ k.transpose(-1, -2) * (D // HEADS) ** -0.5, dim=-1)
        h = (att @ v).permute(0, 2, 1, 3).reshape(B, N, D)
        h = F.linear(h, g[f"blocks.{i}.attn.proj.weight"], g[f"blocks.{i}.attn.proj.bias"])
        tok = tok + gate_msa[:, None] * h
        h = ln(tok) * (1 + sc_mlp[:, None]) + s_mlp[:, None]
        h = F.linear(h, g[f"blocks.{i}.mlp.fc1.weight"], g[f"blocks.{i}.mlp.fc1.bias"])
        h = F.gelu(h, approximate="tanh")
        h = F.linear(h, g[f"blocks.{i}.mlp.fc2.weight"], g[f"blocks.{i}.mlp.fc2.bias"])
        tok = tok + gate_mlp[:, None] * h

    mods = F.linear(F.silu(c), g["final_layer.adaLN_modulation.1.weight"],
                    g["final_layer.adaLN_modulation.1.bias"]).chunk(2, dim=1)
    shift, scale = mods
    tok = ln(tok) * (1 + scale[:, None]) + shift[:, None]
    tok = F.linear(tok, g["final_layer.linear.weight"], g["final_layer.linear.bias"])

    # unpatchify
    B, N, _ = tok.shape
    gh = IMG // P
    out = tok.reshape(B, gh, gh, P, P, 2 * C)
    out = torch.einsum("nhwpqc->nchpwq", out).reshape(B, 2 * C, IMG, IMG)
    return out.numpy()


def flax_model():
    return DiT(input_size=IMG, patch_size=P, in_channels=C, hidden_size=D,
               depth=DEPTH, num_heads=HEADS, num_classes=NCLS,
               attn_backend="xla")


def test_import_forward_parity():
    """Imported weights must reproduce the torch oracle to fp32 tolerance
    (the BASELINE fidelity pin: identical latents given identical inputs)."""
    sd = make_state_dict()
    params = state_dict_to_flax(sd, depth=DEPTH, num_heads=HEADS)
    m = flax_model()
    rs = np.random.RandomState(1)
    x = rs.randn(3, C, IMG, IMG).astype(np.float32)
    t = np.array([0, 250, 999], np.int64)
    y = np.array([0, 5, 9], np.int64)

    got = np.asarray(m.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x),
                             jnp.asarray(t), jnp.asarray(y)))
    expected = torch_oracle_forward(sd, x, t, y)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_roundtrip_export():
    sd = make_state_dict()
    params = state_dict_to_flax(sd, depth=DEPTH, num_heads=HEADS)
    sd2 = flax_to_state_dict(params, patch_size=P, in_channels=C, input_size=IMG)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, err_msg=k)


def test_import_validates_shapes():
    sd = make_state_dict()
    sd["final_layer.linear.weight"] = sd["final_layer.linear.weight"][:-1]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bad.pt")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
        with pytest.raises(ValueError, match="mismatch"):
            import_dit_checkpoint(path, flax_model())


def test_unknown_key_rejected():
    sd = make_state_dict()
    sd["blocks.0.attn.qkv_extra.weight"] = np.zeros((1,))
    with pytest.raises(KeyError):
        state_dict_to_flax(sd, depth=DEPTH, num_heads=HEADS)


def test_ema_preference_and_wrapped_checkpoints(tmp_path):
    """Trainer-style {"model","ema",...} checkpoints load the EMA weights
    (reference download.py:26-29)."""
    sd = make_state_dict(seed=0)
    sd_ema = {k: v + 1.0 for k, v in make_state_dict(seed=0).items()}
    path = str(tmp_path / "train_ckpt.pt")
    torch.save({
        "model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        "ema": {k: torch.from_numpy(np.asarray(v)) for k, v in sd_ema.items()},
        "opt": {}, "args": {},
    }, path)
    got = load_torch_checkpoint(path)
    np.testing.assert_allclose(got["t_embedder.mlp.0.bias"],
                               sd_ema["t_embedder.mlp.0.bias"])
    got_model = load_torch_checkpoint(path, prefer_ema=False)
    np.testing.assert_allclose(got_model["t_embedder.mlp.0.bias"],
                               sd["t_embedder.mlp.0.bias"])


def test_import_end_to_end_from_file(tmp_path):
    sd = make_state_dict()
    path = str(tmp_path / "model.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    params = import_dit_checkpoint(path, flax_model())
    m = flax_model()
    out = m.apply(params, jnp.ones((1, C, IMG, IMG)), jnp.array([3]), jnp.array([2]))
    assert out.shape == (1, 2 * C, IMG, IMG)
    assert np.isfinite(np.asarray(out)).all()
