"""Token merging (ToMe) for DiT inference.

The reference's only lever against token count is the static patch-size
trade-off (/root/reference/train_options/models_original.py:328-362: the
/4 and /8 configs quarter/sixteenth the tokens at a permanent fidelity
cost). ToMe (Bolya et al., ICLR'23; "Token Merging for Fast Stable
Diffusion", CVPRW'23) recovers most of that saving dynamically: per block,
the `r` most redundant tokens merge into their most-similar neighbours
before the attention and MLP branches and unmerge after, so the expensive
ops run on N - r tokens while the residual stream keeps all N. No
parameters change — any checkpoint runs unchanged — and it composes with
the FORA layer cache and every sampler.

TPU-native redesign (all three choices measured on v5e, B=16 x 1024 x 1152;
docs/ABLATIONS.md has the table):

- **Static shapes.** The merge count `r` is a Python int, so the merged
  length N - r is compile-time constant and XLA tiles the shrunken matmuls
  onto the MXU like any other shape. Only the gather/scatter *indices* are
  data-dependent.
- **Merge/unmerge are one-hot matmuls, not gather/scatter.** A batched
  scatter-add mean costs ~880 us/block on TPU (serialized) and a batched
  row gather ~280 us; expressing both as (B, N, N-r) one-hot matmuls with
  fp32 accumulation runs them on the MXU at ~130 us each and is bit-exact
  (one-hot rows sum exactly).
- **Ranking is a comparison matrix, not a sort.** `argsort` over the
  (B, Ns) match scores costs ~400 us/block on TPU (bitonic sort network);
  the descending rank `rank_i = #{j: s_j > s_i}` (+ index tie-break, which
  keeps the slot map a bijection even on duplicate tokens) is a fused
  O(Ns^2) VPU compare-reduce, and the kept tokens' slots come from a
  cumsum over the keep mask. Net: 582 vs 783 us/block at r = N/2.

Destination tokens are a deterministic strided grid (one per sy x sx patch
cell — the generator analog of ToMe-SD's random-per-cell pick), so samples
are reproducible given a seed. Proportional (size-weighted) attention is
intentionally omitted, matching the ToMe-SD finding that it does not help
generation; this also keeps the fused Pallas attention kernels (which take
no logit bias) on the fast path.

Like the FORA cache and PipeFusion, ToMe is an approximate fast path and
is opt-in (`tome_ratio=0` is the default and bit-exact).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["tome_merge_count", "bipartite_soft_matching_2d"]


def tome_merge_count(num_patches: int, ratio: float, sx: int = 2,
                     sy: int = 2) -> int:
    """Static merge count for `ratio` (fraction of ALL tokens removed).

    Clipped to the number of source tokens (everything outside the dst
    grid): at the default 2x2 stride the maximum removable fraction is 75%.
    """
    gh = gw = int(round(num_patches ** 0.5))
    assert gh * gw == num_patches, f"non-square token grid: {num_patches}"
    n_dst = ((gh + sy - 1) // sy) * ((gw + sx - 1) // sx)
    r = int(num_patches * ratio)
    return max(0, min(r, num_patches - n_dst))


def _dst_src_split(gh: int, gw: int, sx: int, sy: int):
    """Compile-time constant dst/src token indices on the 2D grid."""
    ii, jj = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    dst_mask = ((ii % sy == 0) & (jj % sx == 0)).reshape(-1)
    return np.flatnonzero(dst_mask), np.flatnonzero(~dst_mask)


def bipartite_soft_matching_2d(metric, r: int, *, sx: int = 2, sy: int = 2):
    """Build (merge, unmerge) for the `r` best source->destination merges.

    metric: (B, N, D) similarity features for a square token grid (the
    block's input tokens). Returns `(merge, unmerge)` where
    `merge(x): (B, N, D) -> (B, N - r, D)` (merged sources are mean-pooled
    into their destination) and `unmerge(y): (B, N - r, D) -> (B, N, D)`
    (each original token reads its representative's row — so
    `merge(unmerge(y)) == y` exactly, and for duplicate-token inputs the
    round trip `unmerge(merge(x)) == x` is lossless). `r` must come from
    `tome_merge_count` (static, pre-clipped).

    Matching is ToMe's bipartite soft matching: each source token scores
    its most cosine-similar destination; the r highest-scoring sources
    merge. Both functions are a single batched matmul against a shared
    one-hot assignment matrix (see module docstring for why that beats
    gather/scatter on TPU).
    """
    B, N, _ = metric.shape
    gh = gw = int(round(N ** 0.5))
    assert gh * gw == N, f"non-square token grid: {N}"
    dst_idx, src_idx = _dst_src_split(gh, gw, sx, sy)
    n_dst, n_src = len(dst_idx), len(src_idx)
    assert 0 < r <= n_src, (r, n_src)
    n_merged = N - r

    m = metric.astype(jnp.float32)
    m = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-6)
    scores = jnp.einsum("bsd,btd->bst", m[:, src_idx], m[:, dst_idx])
    node_max = scores.max(axis=-1)                      # (B, Ns)
    node_idx = scores.argmax(axis=-1).astype(jnp.int32)  # best dst per src

    if r == n_src:
        # every source merges -> no ranking needed at all
        src_slot = node_idx
    else:
        # sort-free descending rank: rank_i = #{j: s_j > s_i}, index
        # tie-break keeps ranks distinct so the slot map stays a bijection
        # even when tokens (hence scores) are exactly equal
        gt = node_max[:, :, None] < node_max[:, None, :]
        tie = (node_max[:, :, None] == node_max[:, None, :]) & (
            jnp.arange(n_src)[None, :] < jnp.arange(n_src)[:, None])[None]
        rank = (gt | tie).sum(axis=-1).astype(jnp.int32)  # 0 = most similar
        merged = rank < r
        kept_slot = n_dst + jnp.cumsum(~merged, axis=1, dtype=jnp.int32) - 1
        src_slot = jnp.where(merged, node_idx, kept_slot)

    # original token -> row of the merged array [dst block | kept block]
    full_map = jnp.zeros((B, N), jnp.int32)
    full_map = full_map.at[:, dst_idx].set(jnp.arange(n_dst, dtype=jnp.int32))
    full_map = full_map.at[:, src_idx].set(src_slot)
    # one-hot assignment: U[b, n, m] = 1 iff token n's representative is m
    U = (full_map[:, :, None] == jnp.arange(n_merged)[None, None, :]
         ).astype(jnp.bfloat16)
    counts = U.sum(axis=1)                              # (B, N - r) >= 1

    def merge(x):
        s = jnp.einsum("bnm,bnd->bmd", U, x,
                       preferred_element_type=jnp.float32)
        return (s / counts[..., None]).astype(x.dtype)

    def unmerge(y):
        return jnp.einsum("bnm,bmd->bnd", U, y,
                          preferred_element_type=jnp.float32).astype(y.dtype)

    return merge, unmerge
