"""SD-VAE tests: flax model vs an independent functional-torch oracle of the
kl-f8 architecture, plus importer structure validation and the latent
scaling contract (0.18215)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from fast_dit_tpu.ckpt.vae_import import (  # noqa: E402
    import_vae_checkpoint,
    vae_state_dict_to_flax,
)
from fast_dit_tpu.models.vae import (  # noqa: E402
    VAE_SCALE,
    AutoencoderKL,
    DiagonalGaussian,
    decode_from_latents,
    encode_to_latents,
)

# small config: 2 stages, one downsample; channels divisible by 32
CHANNELS = (32, 64)
LATENT = 4


def make_vae_state_dict(seed=0, channels=None, latent=None):
    """Random diffusers-format AutoencoderKL state dict (any config) — the
    synthetic stand-in for sd-vae-ft-* in this offline environment."""
    CHANNELS = channels if channels is not None else globals()["CHANNELS"]
    LATENT = latent if latent is not None else globals()["LATENT"]
    rs = np.random.RandomState(seed)

    def w(*shape, scale=0.15):
        return rs.randn(*shape).astype(np.float32) * scale

    sd = {}

    def resnet(pfx, cin, cout, shortcut):
        sd[f"{pfx}.norm1.weight"] = w(cin, scale=0.4) + 1
        sd[f"{pfx}.norm1.bias"] = w(cin)
        sd[f"{pfx}.conv1.weight"] = w(cout, cin, 3, 3)
        sd[f"{pfx}.conv1.bias"] = w(cout)
        sd[f"{pfx}.norm2.weight"] = w(cout, scale=0.4) + 1
        sd[f"{pfx}.norm2.bias"] = w(cout)
        sd[f"{pfx}.conv2.weight"] = w(cout, cout, 3, 3)
        sd[f"{pfx}.conv2.bias"] = w(cout)
        if shortcut:
            sd[f"{pfx}.conv_shortcut.weight"] = w(cout, cin, 1, 1)
            sd[f"{pfx}.conv_shortcut.bias"] = w(cout)

    def attn(pfx, c):
        sd[f"{pfx}.group_norm.weight"] = w(c, scale=0.4) + 1
        sd[f"{pfx}.group_norm.bias"] = w(c)
        for n in ("to_q", "to_k", "to_v"):
            sd[f"{pfx}.{n}.weight"] = w(c, c)
            sd[f"{pfx}.{n}.bias"] = w(c)
        sd[f"{pfx}.to_out.0.weight"] = w(c, c)
        sd[f"{pfx}.to_out.0.bias"] = w(c)

    # encoder
    sd["encoder.conv_in.weight"] = w(CHANNELS[0], 3, 3, 3)
    sd["encoder.conv_in.bias"] = w(CHANNELS[0])
    cin = CHANNELS[0]
    for i, ch in enumerate(CHANNELS):
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else ch,
                   ch, shortcut=(j == 0 and cin != ch))
        cin = ch
        if i < len(CHANNELS) - 1:
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = w(ch, ch, 3, 3)
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = w(ch)
    top = CHANNELS[-1]
    resnet("encoder.mid_block.resnets.0", top, top, False)
    attn("encoder.mid_block.attentions.0", top)
    resnet("encoder.mid_block.resnets.1", top, top, False)
    sd["encoder.conv_norm_out.weight"] = w(top, scale=0.4) + 1
    sd["encoder.conv_norm_out.bias"] = w(top)
    sd["encoder.conv_out.weight"] = w(2 * LATENT, top, 3, 3)
    sd["encoder.conv_out.bias"] = w(2 * LATENT)
    sd["quant_conv.weight"] = w(2 * LATENT, 2 * LATENT, 1, 1)
    sd["quant_conv.bias"] = w(2 * LATENT)
    # decoder
    sd["post_quant_conv.weight"] = w(LATENT, LATENT, 1, 1)
    sd["post_quant_conv.bias"] = w(LATENT)
    rev = list(reversed(CHANNELS))
    sd["decoder.conv_in.weight"] = w(rev[0], LATENT, 3, 3)
    sd["decoder.conv_in.bias"] = w(rev[0])
    resnet("decoder.mid_block.resnets.0", rev[0], rev[0], False)
    attn("decoder.mid_block.attentions.0", rev[0])
    resnet("decoder.mid_block.resnets.1", rev[0], rev[0], False)
    cin = rev[0]
    for i, ch in enumerate(rev):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else ch,
                   ch, shortcut=(j == 0 and cin != ch))
        cin = ch
        if i < len(rev) - 1:
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = w(ch, ch, 3, 3)
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = w(ch)
    sd["decoder.conv_norm_out.weight"] = w(rev[-1], scale=0.4) + 1
    sd["decoder.conv_norm_out.bias"] = w(rev[-1])
    sd["decoder.conv_out.weight"] = w(3, rev[-1], 3, 3)
    sd["decoder.conv_out.bias"] = w(3)
    return sd


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------

def t_resnet(g, pfx, x):
    h = F.group_norm(x, 32, g[f"{pfx}.norm1.weight"], g[f"{pfx}.norm1.bias"], eps=1e-6)
    h = F.conv2d(F.silu(h), g[f"{pfx}.conv1.weight"], g[f"{pfx}.conv1.bias"], padding=1)
    h = F.group_norm(h, 32, g[f"{pfx}.norm2.weight"], g[f"{pfx}.norm2.bias"], eps=1e-6)
    h = F.conv2d(F.silu(h), g[f"{pfx}.conv2.weight"], g[f"{pfx}.conv2.bias"], padding=1)
    if f"{pfx}.conv_shortcut.weight" in g:
        x = F.conv2d(x, g[f"{pfx}.conv_shortcut.weight"], g[f"{pfx}.conv_shortcut.bias"])
    return x + h


def t_attn(g, pfx, x):
    B, C, H, W = x.shape
    h = F.group_norm(x, 32, g[f"{pfx}.group_norm.weight"], g[f"{pfx}.group_norm.bias"],
                     eps=1e-6)
    h = h.reshape(B, C, H * W).transpose(1, 2)
    q = F.linear(h, g[f"{pfx}.to_q.weight"], g[f"{pfx}.to_q.bias"])
    k = F.linear(h, g[f"{pfx}.to_k.weight"], g[f"{pfx}.to_k.bias"])
    v = F.linear(h, g[f"{pfx}.to_v.weight"], g[f"{pfx}.to_v.bias"])
    att = torch.softmax(q @ k.transpose(-1, -2) * C ** -0.5, dim=-1)
    h = F.linear(att @ v, g[f"{pfx}.to_out.0.weight"], g[f"{pfx}.to_out.0.bias"])
    return x + h.transpose(1, 2).reshape(B, C, H, W)


def torch_encode_moments(g, x):
    x = F.conv2d(x, g["encoder.conv_in.weight"], g["encoder.conv_in.bias"], padding=1)
    for i in range(len(CHANNELS)):
        for j in range(2):
            x = t_resnet(g, f"encoder.down_blocks.{i}.resnets.{j}", x)
        if i < len(CHANNELS) - 1:
            x = F.pad(x, (0, 1, 0, 1))
            x = F.conv2d(x, g[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"],
                         g[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"], stride=2)
    x = t_resnet(g, "encoder.mid_block.resnets.0", x)
    x = t_attn(g, "encoder.mid_block.attentions.0", x)
    x = t_resnet(g, "encoder.mid_block.resnets.1", x)
    x = F.group_norm(x, 32, g["encoder.conv_norm_out.weight"],
                     g["encoder.conv_norm_out.bias"], eps=1e-6)
    x = F.conv2d(F.silu(x), g["encoder.conv_out.weight"], g["encoder.conv_out.bias"],
                 padding=1)
    return F.conv2d(x, g["quant_conv.weight"], g["quant_conv.bias"])


def torch_decode(g, z):
    z = F.conv2d(z, g["post_quant_conv.weight"], g["post_quant_conv.bias"])
    x = F.conv2d(z, g["decoder.conv_in.weight"], g["decoder.conv_in.bias"], padding=1)
    x = t_resnet(g, "decoder.mid_block.resnets.0", x)
    x = t_attn(g, "decoder.mid_block.attentions.0", x)
    x = t_resnet(g, "decoder.mid_block.resnets.1", x)
    for i in range(len(CHANNELS)):
        for j in range(3):
            x = t_resnet(g, f"decoder.up_blocks.{i}.resnets.{j}", x)
        if i < len(CHANNELS) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = F.conv2d(x, g[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"],
                         g[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"], padding=1)
    x = F.group_norm(x, 32, g["decoder.conv_norm_out.weight"],
                     g["decoder.conv_norm_out.bias"], eps=1e-6)
    return F.conv2d(F.silu(x), g["decoder.conv_out.weight"], g["decoder.conv_out.bias"],
                    padding=1)


def small_vae():
    return AutoencoderKL(block_out_channels=CHANNELS, latent_channels=LATENT)


def test_encode_decode_parity_vs_torch_oracle():
    sd = make_vae_state_dict()
    params = vae_state_dict_to_flax(sd)
    params = jax.tree.map(jnp.asarray, params)
    vae = small_vae()

    rs = np.random.RandomState(1)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)
    g = {k: torch.from_numpy(v) for k, v in sd.items()}

    moments = np.asarray(vae.apply(params, jnp.asarray(x), method=vae.encode_moments))
    expected = torch_encode_moments(g, torch.from_numpy(x)).numpy()
    assert moments.shape == expected.shape == (2, 8, 8, 8)  # one downsample
    np.testing.assert_allclose(moments, expected, rtol=5e-4, atol=5e-5)

    z = rs.randn(2, LATENT, 8, 8).astype(np.float32)
    img = np.asarray(vae.apply(params, jnp.asarray(z), method=vae.decode))
    expected = torch_decode(g, torch.from_numpy(z)).numpy()
    assert img.shape == expected.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(img, expected, rtol=5e-4, atol=5e-4)


def test_import_structure_matches_model(tmp_path):
    sd = make_vae_state_dict()
    import torch as th
    path = str(tmp_path / "vae.bin")
    th.save({k: th.from_numpy(v) for k, v in sd.items()}, path)
    params = import_vae_checkpoint(path, small_vae())  # raises on mismatch
    n = sum(p.size for p in jax.tree.leaves(params))
    assert n > 0


def test_legacy_attention_names():
    sd = make_vae_state_dict()
    legacy = {}
    for k, v in sd.items():
        k = (k.replace("to_q.", "query.").replace("to_k.", "key.")
             .replace("to_v.", "value.").replace("to_out.0.", "proj_attn."))
        legacy[k] = v
    a = vae_state_dict_to_flax(sd)
    b = vae_state_dict_to_flax(legacy)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        assert pa == pb
        np.testing.assert_array_equal(la, lb)


def test_diagonal_gaussian():
    rs = np.random.RandomState(0)
    moments = jnp.asarray(rs.randn(2, 4, 4, 8).astype(np.float32))
    dist = DiagonalGaussian(moments)
    assert dist.mean.shape == (2, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(dist.mode()), np.asarray(dist.mean))
    s1 = dist.sample(jax.random.PRNGKey(0))
    s2 = dist.sample(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert not np.allclose(np.asarray(dist.sample(jax.random.PRNGKey(1))), np.asarray(s1))
    # logvar clamp
    big = DiagonalGaussian(jnp.full((1, 2, 2, 8), 100.0))
    assert float(big.logvar.max()) == 20.0


def test_latent_scale_roundtrip():
    """encode*0.18215 then decode(z/0.18215) must traverse the same z."""
    sd = make_vae_state_dict()
    params = jax.tree.map(jnp.asarray, vae_state_dict_to_flax(sd))
    vae = small_vae()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32))
    z = encode_to_latents(vae, params, x, jax.random.PRNGKey(0))
    assert z.shape == (1, 4, 8, 8)
    img = decode_from_latents(vae, params, z)
    assert img.shape == (1, 3, 16, 16)
    # scaling contract: z is 0.18215 * the raw latent sample
    moments = vae.apply(params, x, method=vae.encode_moments)
    dist = DiagonalGaussian(jnp.transpose(moments, (0, 2, 3, 1)))
    raw = jnp.transpose(dist.sample(jax.random.PRNGKey(0)), (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(z), np.asarray(raw) * VAE_SCALE, rtol=1e-6)
    assert VAE_SCALE == 0.18215


def test_full_size_architecture_shapes():
    """The real kl-f8 config: 256x256 -> 4x32x32 latents, param count ~83.7M."""
    vae = AutoencoderKL()
    params = jax.eval_shape(
        lambda: vae.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 3, 256, 256)), jax.random.PRNGKey(0)))
    moments = jax.eval_shape(
        lambda p: vae.apply(p, jnp.zeros((1, 3, 256, 256)), method=vae.encode_moments),
        params)
    assert moments.shape == (1, 8, 32, 32)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 83_000_000 < n < 84_000_000, n
