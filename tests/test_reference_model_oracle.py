"""Pin the flax DiT forward against the LITERAL reference model
(`/root/reference/train_options/models_original.py`) — the L2 analog of
test_reference_oracle.py's L1 pinning (VERDICT r3 item 8).

The reference file imports `timm.models.vision_transformer.{PatchEmbed,
Attention, Mlp}`. When real timm is importable we use it; in this offline
image (no timm) we register a minimal shim faithful to timm 0.9.16's
architecture and state-dict layout (conv patchify -> flatten/transpose;
fused-qkv attention with head_dim**-0.5 scaling; fc1/act/fc2 MLP), so the
LITERAL reference code — adaLN-Zero blocks, embedders, final layer,
pos-embed init, forward/forward_with_cfg (models_original.py:101-266) —
still executes unmodified. Both conversion directions are pinned:
reference state_dict -> `state_dict_to_flax`, and our params ->
`flax_to_state_dict` -> `load_state_dict(strict=True)` on the reference
model.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from fast_dit_tpu.ckpt import flax_to_state_dict, state_dict_to_flax  # noqa: E402
from fast_dit_tpu.models import DiT  # noqa: E402

REF_PATH = "/root/reference/train_options/models_original.py"


def _install_timm_shim():
    """timm-0.9.16-compatible PatchEmbed/Attention/Mlp (state-dict layout:
    proj.{weight,bias} conv, qkv/proj Linears, fc1/fc2 Linears)."""
    import torch.nn as nn

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True, bias=True):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_norm=False,
                     attn_drop=0.0, proj_drop=0.0):
            super().__init__()
            assert dim % num_heads == 0
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      self.head_dim).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, bias=True,
                     drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.PatchEmbed, vt.Attention, vt.Mlp = PatchEmbed, Attention, Mlp
    models.vision_transformer = vt
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vt


def load_reference_module():
    import os

    if not os.path.exists(REF_PATH):
        pytest.skip(f"reference model file not found at {REF_PATH}")
    try:
        import timm  # noqa: F401
    except ImportError:
        _install_timm_shim()
    spec = importlib.util.spec_from_file_location("ref_models_original",
                                                  REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


CFG = dict(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
           depth=2, num_heads=4, num_classes=10)


def build_pair():
    ref = load_reference_module()
    torch.manual_seed(0)
    tmodel = ref.DiT(**CFG, mlp_ratio=4.0, class_dropout_prob=0.1,
                     learn_sigma=True).eval()
    jmodel = DiT(**CFG, attn_backend="einsum")
    return tmodel, jmodel


def fixed_inputs():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([37, 999], np.int64)
    y = np.array([3, 7], np.int64)
    return x, t, y


def test_torch_to_flax_forward_parity():
    tmodel, jmodel = build_pair()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = jax.tree.map(jnp.asarray,
                          state_dict_to_flax(sd, jmodel.depth,
                                             jmodel.num_heads))
    x, t, y = fixed_inputs()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(y)).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(t),
                                  jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flax_to_torch_forward_parity():
    tmodel, jmodel = build_pair()
    x, t, y = fixed_inputs()
    params = jmodel.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                         jnp.asarray(t), jnp.asarray(y))
    # zero-init head -> all-zero eps head; perturb so parity is non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
                  for p, k in zip(leaves, keys)])

    sd = flax_to_state_dict(params, jmodel.patch_size,
                            in_channels=jmodel.in_channels,
                            input_size=jmodel.input_size)
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=True)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(y)).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(t),
                                  jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_forward_with_cfg_parity():
    """The 3-channel CFG quirk against the literal reference
    forward_with_cfg (models_original.py:250-266)."""
    tmodel, jmodel = build_pair()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = jax.tree.map(jnp.asarray,
                          state_dict_to_flax(sd, jmodel.depth,
                                             jmodel.num_heads))
    rs = np.random.RandomState(1)
    n = 2
    x = rs.randn(2 * n, 4, 8, 8).astype(np.float32)
    t = np.full((2 * n,), 421, np.int64)
    y = np.array([3, 7, 10, 10], np.int64)
    with torch.no_grad():
        want = tmodel.forward_with_cfg(torch.from_numpy(x),
                                       torch.from_numpy(t),
                                       torch.from_numpy(y), 4.0).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(t),
                                  jnp.asarray(y),
                                  method=jmodel.forward_with_cfg,
                                  cfg_scale=4.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
