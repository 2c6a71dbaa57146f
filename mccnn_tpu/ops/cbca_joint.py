"""Disparity-conditioned joint-region CBCA (the paper's full variant).

Behavioral spec (reference: src/process_functional.py:122-144 and
compute_disparity_union_region :661-729 — present but DISABLED there,
"too large and is impractical to run"): at disparity d, a member q=(h_,w_)
of p=(h,w)'s support region survives iff
  * q has no correspondent (left volume: ``w_ < d``; right: ``w_+d >= W``), or
  * q's correspondent lies in the correspondent pixel's support region of
    the OTHER image (left volume: ``(h_, w_-d)`` in region_R(h, w-d)).
Pixels whose own correspondent is out of range keep their raw region
(reference :673-676). Aggregation then averages over the surviving members.

Documented deviations (PARITY.md): the reference's disabled code cannot
execute (``d__union_region`` NameError at :686) and its membership test
(`region[region == pos]`) compares coordinates elementwise rather than as
pairs; we implement the paper's intended pair membership, pinned by a
fresh oracle (tests/oracles.py::joint_cbca_oracle).

TPU formulation: with offsets (ov, oh) = (h_-h, w_-w), membership factors
as  gLv(ov) * gLh(ov,oh) * [B(oh) + (1-B(oh)) * gRv(ov) * gRh(ov,oh)]
where gL* are p's own-image arm gates, gR* are the other image's arm gates
probed at the correspondent column (a per-d shift of the arm planes), and
B is the no-correspondent test. Both terms are separable, so each
disparity slice aggregates with two horizontal+vertical gated stencils —
O(H*W*radius) per disparity, the same order as plain CBCA per slice (the
reference's formulation stored O(H*W*(2*dist)^2*ndisp) region lists).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mccnn_tpu.ops.cbca import CrossArms, cbca


def _shift_cols(plane: jax.Array, shift, fill):
    """plane[:, w + shift] with out-of-range columns = fill (traced shift)."""
    height, width = plane.shape
    pad = width
    padded = jnp.pad(plane, ((0, 0), (pad, pad)), constant_values=fill)
    return lax.dynamic_slice(padded, (0, pad + shift), (height, width))


def cbca_joint(
    volume: jax.Array,
    arms_self: CrossArms,
    arms_other: CrossArms,
    num_iterations: int,
    distance_threshold: int,
    ndisp: int,
    choice: str,
) -> jax.Array:
    """Aggregate a (H, W, D) volume over disparity-conditioned regions.

    ``arms_self`` are the volume's own image arms (left image for the left
    volume), ``arms_other`` the other image's. ``choice`` is "L" or "R".
    Disparity-pad lanes (d >= ndisp) are aggregated with the plain regions
    (they hold the BIG_COST sentinel either way).
    """
    if num_iterations == 0:
        return volume
    height, width, d_pad = volume.shape
    radius = distance_threshold - 1
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    sign = -1 if choice == "L" else +1

    def gated_hsum(vol2d, h_gate_fn):
        """sum_oh h_gate(oh)[h, w] * vol2d[h, w + oh] over oh in [-r, r]."""
        acc = vol2d * h_gate_fn(0)
        for oh in range(1, radius + 1):
            acc = acc + h_gate_fn(oh) * _shift_cols(vol2d, oh, 0.0)
            acc = acc + h_gate_fn(-oh) * _shift_cols(vol2d, -oh, 0.0)
        return acc

    def gated_vsum(mid, up_arm, down_arm):
        padded = jnp.pad(mid, ((radius, radius), (0, 0)))
        acc = mid
        for ov in range(1, radius + 1):
            acc = acc + jnp.where(down_arm >= ov, 1.0, 0.0) * padded[
                radius + ov: radius + ov + height
            ]
            acc = acc + jnp.where(up_arm >= ov, 1.0, 0.0) * padded[
                radius - ov: radius - ov + height
            ]
        return acc

    self_l = arms_self.left
    self_r = arms_self.right

    def one_slice(d, vol2d):
        """One disparity slice through the joint-region average."""
        # other-image arm planes probed at the correspondent column
        oth_l = _shift_cols(arms_other.left, sign * d, -1)
        oth_r = _shift_cols(arms_other.right, sign * d, -1)
        oth_u = _shift_cols(arms_other.up, sign * d, -1)
        oth_d = _shift_cols(arms_other.down, sign * d, -1)

        if choice == "L":
            def border(oh):  # member has no correspondent
                return cols + oh < d
        else:
            def border(oh):
                return cols + oh + d >= width

        def own_h(oh):
            if oh >= 0:
                return self_r >= oh
            return self_l >= -oh

        def oth_h(oh):
            if oh >= 0:
                return oth_r >= oh
            return oth_l >= -oh

        def h_gate_border(oh):
            return jnp.where(own_h(oh) & border(oh), 1.0, 0.0)

        def h_gate_joint(oh):
            return jnp.where(own_h(oh) & oth_h(oh) & ~border(oh), 1.0, 0.0)

        ones = jnp.ones_like(vol2d)
        # term 1: members kept by the no-correspondent rule (own vertical)
        t1 = gated_vsum(gated_hsum(vol2d, h_gate_border),
                        arms_self.up, arms_self.down)
        n1 = gated_vsum(gated_hsum(ones, h_gate_border),
                        arms_self.up, arms_self.down)
        # term 2: members kept by joint membership (own AND other vertical)
        joint_up = jnp.minimum(arms_self.up, jnp.maximum(oth_u, 0))
        joint_down = jnp.minimum(arms_self.down, jnp.maximum(oth_d, 0))
        t2 = gated_vsum(gated_hsum(vol2d, h_gate_joint), joint_up, joint_down)
        n2 = gated_vsum(gated_hsum(ones, h_gate_joint), joint_up, joint_down)

        out = (t1 + t2) / jnp.maximum(n1 + n2, 1.0)
        # pixels whose own correspondent is out of range keep the raw region
        raw_pixel = (cols < d) if choice == "L" else (cols + d >= width)
        plain = gated_vsum(
            gated_hsum(vol2d, lambda oh: jnp.where(own_h(oh), 1.0, 0.0)),
            arms_self.up, arms_self.down,
        )
        plain_n = gated_vsum(
            gated_hsum(ones, lambda oh: jnp.where(own_h(oh), 1.0, 0.0)),
            arms_self.up, arms_self.down,
        )
        return jnp.where(raw_pixel, plain / plain_n, out)

    def one_round(_, vol):
        def step(d, acc):
            slice_out = one_slice(d, lax.dynamic_index_in_dim(
                vol, d, axis=2, keepdims=False))
            return lax.dynamic_update_index_in_dim(
                acc, slice_out.astype(vol.dtype), d, axis=2
            )

        # real disparities get joint regions; pad lanes keep plain regions
        out = cbca(vol, arms_self, 1, distance_threshold)
        return lax.fori_loop(0, ndisp, step, out)

    return lax.fori_loop(0, num_iterations, one_round, volume)
