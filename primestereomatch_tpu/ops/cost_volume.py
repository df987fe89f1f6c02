"""Cost volume construction (CVC): per-disparity color+gradient AD cost.

Reference semantics (CPU float golden path, src/CVC.cpp:18-39,122-179):

  cost(d, y, x) = ALPHA * (|dB| + |dG| + |dR|) + (1-ALPHA) * |dGradX|

  left volume : matches L(y, x) against R(y, x-d);  x < d     -> border cost
  right volume: matches R(y, x) against L(y, x+d);  x >= W-d  -> border cost
  border cost : every operand of the other view replaced by BC = 1.0
                (src/CVC.cpp:30-39)

No TAU clamping and no /3 color normalization on this path (the clamps are
commented out at src/CVC.cpp:24-25; they exist only in the OpenCL kernel
assets/cvc.cl:375-393 — exposed here via `tau1`/`tau2` for capability parity).

TPU-first design: the disparity loop is a static unroll of cheap
slice + fused elementwise ops producing a dense (D, H, W) f32 volume; XLA
fuses the whole construction into a small number of HBM passes. D, H, W are
all static. A Pallas variant (kernels/) fuses CVC with the WTA consumer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pair_cost(
    img_a: jax.Array,     # (H, W, 3)
    img_b: jax.Array,     # (H, W, 3) shifted view
    grd_a: jax.Array,     # (H, W)
    grd_b: jax.Array,     # (H, W)
    alpha: float,
    tau1: float | None,
    tau2: float | None,
) -> jax.Array:
    clr = jnp.sum(jnp.abs(img_a - img_b), axis=-1)
    grd = jnp.abs(grd_a - grd_b)
    if tau1 is not None:
        clr = jnp.minimum(clr, tau1)
    if tau2 is not None:
        grd = jnp.minimum(grd, tau2)
    return alpha * clr + (1.0 - alpha) * grd


def build_cost_volumes(
    l_img: jax.Array,     # (H, W, 3) float32 in [0,1]
    r_img: jax.Array,     # (H, W, 3)
    l_grd: jax.Array,     # (H, W) Sobel-x of gray
    r_grd: jax.Array,     # (H, W)
    max_dis: int,
    alpha: float = 0.9,
    border_cost: float = 1.0,
    tau1: float | None = None,
    tau2: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (left_cv, right_cv), each (max_dis, H, W) float32.

    d=0 is built like the reference does (DispEst.cpp:209-218) even though
    WTA never selects it (DispSel.cpp:96 starts at d=1).
    """
    H, W, _ = l_img.shape
    dt = l_img.dtype

    # Border cost depends only on the local view (other view operands = BC).
    bc = jnp.asarray(border_cost, dt)
    l_border = _pair_cost(
        l_img, jnp.full_like(l_img, bc), l_grd, jnp.full_like(l_grd, bc),
        alpha, tau1, tau2,
    )
    r_border = _pair_cost(
        r_img, jnp.full_like(r_img, bc), r_grd, jnp.full_like(r_grd, bc),
        alpha, tau1, tau2,
    )

    x = jnp.arange(W)[None, :]  # (1, W) broadcast over rows

    # Pad the "other" view so each disparity is a static slice.
    r_img_p = jnp.pad(r_img, ((0, 0), (max_dis, 0), (0, 0)))
    r_grd_p = jnp.pad(r_grd, ((0, 0), (max_dis, 0)))
    l_img_p = jnp.pad(l_img, ((0, 0), (0, max_dis), (0, 0)))
    l_grd_p = jnp.pad(l_grd, ((0, 0), (0, max_dis)))

    l_slices = []
    r_slices = []
    for d in range(max_dis):
        # left: other view sampled at x-d
        rb = r_img_p[:, max_dis - d : max_dis - d + W]
        rgb = r_grd_p[:, max_dis - d : max_dis - d + W]
        cl = _pair_cost(l_img, rb, l_grd, rgb, alpha, tau1, tau2)
        l_slices.append(jnp.where(x >= d, cl, l_border))
        # right: other view sampled at x+d
        lb = l_img_p[:, d : d + W]
        lgb = l_grd_p[:, d : d + W]
        cr = _pair_cost(r_img, lb, r_grd, lgb, alpha, tau1, tau2)
        r_slices.append(jnp.where(x < W - d, cr, r_border))

    return jnp.stack(l_slices), jnp.stack(r_slices)


def build_cost_volumes_sampled(
    l_img: jax.Array,     # (H, W, 3) float32 in [0,1]
    r_img: jax.Array,
    l_grd: jax.Array,     # (H, W)
    r_grd: jax.Array,
    max_dis: int,
    yi,                   # (h,) static numpy row sample indices
    xi,                   # (w,) static numpy column sample indices
    alpha: float = 0.9,
    border_cost: float = 1.0,
    tau1: float | None = None,
    tau2: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Cost volumes evaluated ONLY at the (yi, xi) sample grid — the
    nearest-downsampled volumes the FastGuidedFilter consumes
    (src/fastguidedfilter.cpp:96,132 downsample each slice with INTER_NN).

    Bitwise-identical to resize_nearest(build_cost_volumes(...)) but never
    materializes (or even computes) the full-resolution volume: 1/s^2 of
    the work. When the column grid is an exact stride (W % s == 0, the
    2K/HD720 case), the per-disparity shifted views are STATIC SLICES of s
    polyphase planes instead of gathers — d = s*q + r samples column
    s*(j - q) - r, i.e. polyphase plane r shifted by q whole low-res
    pixels — so the whole construction lowers to fused slice+FMA with no
    gather units on the hot path. Returns ((D, h, w), (D, h, w))."""
    import numpy as np

    H, W, _ = l_img.shape
    dt = l_img.dtype
    yi = np.asarray(yi)
    xi = np.asarray(xi)
    w = len(xi)

    def pcost(a_img, b_img, a_grd, b_grd):
        return _pair_cost(a_img, b_img, a_grd, b_grd, alpha, tau1, tau2)

    bc = jnp.asarray(border_cost, dt)

    # rows can be gathered once; columns shift per disparity
    l_rows = l_img[yi]            # (h, W, 3)
    r_rows = r_img[yi]
    lg_rows = l_grd[yi]
    rg_rows = r_grd[yi]

    l_s = l_rows[:, xi]           # (h, w, 3) sampled left view
    r_s = r_rows[:, xi]
    lg_s = lg_rows[:, xi]
    rg_s = rg_rows[:, xi]

    l_border = pcost(l_s, jnp.full_like(l_s, bc), lg_s, jnp.full_like(lg_s, bc))
    r_border = pcost(r_s, jnp.full_like(r_s, bc), rg_s, jnp.full_like(rg_s, bc))

    xs = jnp.asarray(xi)[None, :]
    l_slices = []
    r_slices = []

    s = W // w
    strided = W % w == 0 and np.array_equal(xi, np.arange(w) * s)
    if strided:
        h = len(yi)
        qmax = (max_dis - 1) // s
        # polyphase planes: bundle image+gradient as 4 channels so every
        # slice below is shared. resh[:, j, r] = column s*j + r.
        r4 = jnp.concatenate([r_rows, rg_rows[..., None]], axis=-1)
        l4 = jnp.concatenate([l_rows, lg_rows[..., None]], axis=-1)
        r4 = r4.reshape(h, w, s, 4)
        l4 = l4.reshape(h, w, s, 4)

        # left volume: column s*j - d = s*(j-q) - r.
        #   r = 0: plane resh[:, j-q, 0]
        #   r > 0: plane resh[:, j-q-1, s-r]
        # masked lanes (s*j < d) get l_border, so left padding is arbitrary.
        def lplane(r):
            if r == 0:
                p = r4[:, :, 0]
            else:
                p = jnp.concatenate([r4[:, :1, s - r], r4[:, :-1, s - r]], axis=1)
            return jnp.pad(p, ((0, 0), (qmax, 0), (0, 0)))

        # right volume: column s*j + d = s*(j+q) + r -> plane resh[:, j+q, r]
        def rplane(r):
            return jnp.pad(l4[:, :, r], ((0, 0), (0, qmax), (0, 0)))

        lp = [lplane(r) for r in range(s)]
        rp = [rplane(r) for r in range(s)]
        for d in range(max_dis):
            q, r = divmod(d, s)
            pl_ = jax.lax.slice_in_dim(lp[r], qmax - q, qmax - q + w, axis=1)
            cl = pcost(l_s, pl_[..., :3], lg_s, pl_[..., 3])
            l_slices.append(jnp.where(xs >= d, cl, l_border))
            pr_ = jax.lax.slice_in_dim(rp[r], q, q + w, axis=1)
            cr = pcost(r_s, pr_[..., :3], rg_s, pr_[..., 3])
            r_slices.append(jnp.where(xs < W - d, cr, r_border))
        return jnp.stack(l_slices), jnp.stack(r_slices)

    for d in range(max_dis):
        xb = np.clip(xi - d, 0, W - 1)      # static per-d column sample
        cl = pcost(l_s, r_rows[:, xb], lg_s, rg_rows[:, xb])
        l_slices.append(jnp.where(xs >= d, cl, l_border))
        xf = np.clip(xi + d, 0, W - 1)
        cr = pcost(r_s, l_rows[:, xf], rg_s, lg_rows[:, xf])
        r_slices.append(jnp.where(xs < W - d, cr, r_border))

    return jnp.stack(l_slices), jnp.stack(r_slices)


def build_cost_volume_block_sampled(
    l_img: jax.Array,     # (H, W, 3) float32 (a row tile, possibly extended)
    r_img: jax.Array,
    l_grd: jax.Array,
    r_grd: jax.Array,
    d_start: jax.Array,   # scalar int32 — TRACED block offset
    block: int,
    max_dis: int,
    yi,                   # (h,) static row sample indices (tile-local)
    xi,                   # (w,) static column sample indices (global x grid)
    alpha: float = 0.9,
    border_cost: float = 1.0,
    tau1: float | None = None,
    tau2: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Disparity-sharded CVC evaluated only at the FGF sample grid — the
    sharded-pipeline analog of `build_cost_volumes_sampled` (the fast
    single-chip path): the traced block offset becomes a dynamic slice of
    max_dis-padded sampled-row planes, the static xi gather happens once.
    Bitwise == resize_nearest(build_cost_volume_block(...))."""
    import numpy as np

    H, W, _ = l_img.shape
    dt = l_img.dtype
    yi = np.asarray(yi)
    xi = np.asarray(xi)
    w_low = len(xi)
    d_start = jnp.asarray(d_start, jnp.int32)

    def pcost(a_img, b_img, a_grd, b_grd):
        return _pair_cost(a_img, b_img, a_grd, b_grd, alpha, tau1, tau2)

    bc = jnp.asarray(border_cost, dt)
    l_rows = l_img[yi]
    r_rows = r_img[yi]
    lg_rows = l_grd[yi]
    rg_rows = r_grd[yi]
    l_s = l_rows[:, xi]
    r_s = r_rows[:, xi]
    lg_s = lg_rows[:, xi]
    rg_s = rg_rows[:, xi]

    l_border = pcost(l_s, jnp.full_like(l_s, bc), lg_s, jnp.full_like(lg_s, bc))
    r_border = pcost(r_s, jnp.full_like(r_s, bc), rg_s, jnp.full_like(rg_s, bc))

    # pre-gather every sampled column at every possible shift once:
    # plane[k] = rows[:, clip(xi - max_dis + k)] for k in [0, 2*max_dis]
    # -> disparity d starts at k = max_dis - d (left) / max_dis + d (right)
    h = len(yi)

    def shift_planes(rows):
        cols = []
        for k in range(2 * max_dis + 1):
            idx = np.clip(xi - max_dis + k, 0, W - 1)
            cols.append(rows[:, idx])
        return jnp.stack(cols, axis=0)      # (2*max_dis+1, h, w[, 3])

    r_pl = shift_planes(r_rows)
    rg_pl = shift_planes(rg_rows)
    l_pl = shift_planes(l_rows)
    lg_pl = shift_planes(lg_rows)

    xs = jnp.asarray(xi)[None, :]
    l_slices = []
    r_slices = []
    for jblk in range(block):
        d = d_start + jblk
        args_l = [
            jax.lax.dynamic_slice(p, (max_dis - d, 0, 0) + ((0,) if p.ndim == 4 else ()),
                                  (1, h, w_low) + ((3,) if p.ndim == 4 else ()))[0]
            for p in (r_pl, rg_pl)
        ]
        cl = pcost(l_s, args_l[0], lg_s, args_l[1])
        l_slices.append(jnp.where(xs >= d, cl, l_border))
        args_r = [
            jax.lax.dynamic_slice(p, (max_dis + d, 0, 0) + ((0,) if p.ndim == 4 else ()),
                                  (1, h, w_low) + ((3,) if p.ndim == 4 else ()))[0]
            for p in (l_pl, lg_pl)
        ]
        cr = pcost(r_s, args_r[0], rg_s, args_r[1])
        r_slices.append(jnp.where(xs < W - d, cr, r_border))

    return jnp.stack(l_slices), jnp.stack(r_slices)


def build_cost_volume_block(
    l_img: jax.Array,     # (H, W, 3) float32 in [0,1]
    r_img: jax.Array,
    l_grd: jax.Array,     # (H, W)
    r_grd: jax.Array,
    d_start: jax.Array,   # scalar int32 — TRACED block offset (mesh axis_index)
    block: int,           # static block length
    max_dis: int,         # static global disparity range (>= d_start + block)
    alpha: float = 0.9,
    border_cost: float = 1.0,
    tau1: float | None = None,
    tau2: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Disparity-sharded CVC: builds only disparities [d_start, d_start+block).

    Same numerics as `build_cost_volumes` (reference src/CVC.cpp:122-179),
    but the block offset is a traced scalar so the SAME compiled SPMD program
    serves every shard of a disparity-sharded mesh (parallel/sharded.py).
    The shifted views become `lax.dynamic_slice`s of max_dis-padded planes —
    still static shapes, still one fused HBM pass per slice.
    """
    H, W, _ = l_img.shape
    dt = l_img.dtype
    d_start = jnp.asarray(d_start, jnp.int32)

    bc = jnp.asarray(border_cost, dt)
    l_border = _pair_cost(
        l_img, jnp.full_like(l_img, bc), l_grd, jnp.full_like(l_grd, bc),
        alpha, tau1, tau2,
    )
    r_border = _pair_cost(
        r_img, jnp.full_like(r_img, bc), r_grd, jnp.full_like(r_grd, bc),
        alpha, tau1, tau2,
    )

    x = jnp.arange(W)[None, :]

    r_img_p = jnp.pad(r_img, ((0, 0), (max_dis, 0), (0, 0)))
    r_grd_p = jnp.pad(r_grd, ((0, 0), (max_dis, 0)))
    l_img_p = jnp.pad(l_img, ((0, 0), (0, max_dis), (0, 0)))
    l_grd_p = jnp.pad(l_grd, ((0, 0), (0, max_dis)))

    l_slices = []
    r_slices = []
    for j in range(block):
        d = d_start + j
        rb = jax.lax.dynamic_slice(r_img_p, (0, max_dis - d, 0), (H, W, 3))
        rgb = jax.lax.dynamic_slice(r_grd_p, (0, max_dis - d), (H, W))
        cl = _pair_cost(l_img, rb, l_grd, rgb, alpha, tau1, tau2)
        l_slices.append(jnp.where(x >= d, cl, l_border))

        lb = jax.lax.dynamic_slice(l_img_p, (0, d, 0), (H, W, 3))
        lgb = jax.lax.dynamic_slice(l_grd_p, (0, d), (H, W))
        cr = _pair_cost(r_img, lb, r_grd, lgb, alpha, tau1, tau2)
        r_slices.append(jnp.where(x < W - d, cr, r_border))

    return jnp.stack(l_slices), jnp.stack(r_slices)


def build_cost_volumes_u8(
    l_bgr_u8: jax.Array,   # (H, W, 3) uint8 (BGR as loaded)
    r_bgr_u8: jax.Array,
    l_grd_u8: jax.Array,   # (H, W) uint8 saturated Sobel (ops/color.py)
    r_grd_u8: jax.Array,
    max_dis: int,
    alpha: float = 0.9,
    tau1_us: int = 1835,   # TAU_1_US, assets/cvc.cl:26 (0.028 * USHRT_MAX)
    tau2_us: int = 524,    # TAU_2_US, assets/cvc.cl:27
) -> tuple[jax.Array, jax.Array]:
    """Quantized uint8 CVC — the capability surface of the reference's
    (shipped-commented-out) uchar OpenCL kernels, assets/cvc.cl:42-126
    (cvc_uchar_vx) with the CV_8U host prep of src/CVC_cl.cpp:125-131.

    Per-disparity cost in uint8:

      clr = (|dR| + |dG| + |dB|) / 3        (integer division)
      grd = |dGrdX|                          (u8 gradients)
      cost = uchar(ALPHA*clr + (1-ALPHA)*grd) (float mul, C-cast truncation)

    with the TAU_US clamps applied first (they are dead for in-range u8
    values — 1835/524 > 255 — but kept configurable for parity), and
    out-of-range matches reading UCHAR_MAX for every other-view operand
    (the u8 analog of the float border cost). Both views use the LR
    kernel's integer /3; the reference RL loop's `* 0.333f` truncation and
    its rGrdX row-start indexing slip (assets/cvc.cl:103-107) are NOT
    replicated — this follows the repo convention of not reproducing
    reference bugs (cf. the sprintf and waitKey cases).

    Returns (left_cv, right_cv) uint8 (max_dis, H, W). Scale-compatible
    with the float pipeline via /255 (the guided filter is linear in p, so
    WTA argmin is scale-invariant)."""
    H, W, _ = l_bgr_u8.shape
    x = jnp.arange(W)[None, :]
    UMAX = jnp.int32(255)

    def pcost(a_img, b_img, a_grd, b_grd):
        clr = (
            jnp.abs(a_img[..., 0] - b_img[..., 0])
            + jnp.abs(a_img[..., 1] - b_img[..., 1])
            + jnp.abs(a_img[..., 2] - b_img[..., 2])
        ) // 3
        grd = jnp.abs(a_grd - b_grd)
        clr = jnp.minimum(clr, tau1_us)
        grd = jnp.minimum(grd, tau2_us)
        # float mul then C-cast truncation toward zero (values >= 0)
        return (
            alpha * clr.astype(jnp.float32)
            + (1.0 - alpha) * grd.astype(jnp.float32)
        ).astype(jnp.uint8)

    li = l_bgr_u8.astype(jnp.int32)
    ri = r_bgr_u8.astype(jnp.int32)
    lg = l_grd_u8.astype(jnp.int32)
    rg = r_grd_u8.astype(jnp.int32)

    l_border = pcost(li, jnp.full_like(li, UMAX), lg, jnp.full_like(lg, UMAX))
    r_border = pcost(ri, jnp.full_like(ri, UMAX), rg, jnp.full_like(rg, UMAX))

    ri_p = jnp.pad(ri, ((0, 0), (max_dis, 0), (0, 0)))
    rg_p = jnp.pad(rg, ((0, 0), (max_dis, 0)))
    li_p = jnp.pad(li, ((0, 0), (0, max_dis), (0, 0)))
    lg_p = jnp.pad(lg, ((0, 0), (0, max_dis)))

    l_slices = []
    r_slices = []
    for d in range(max_dis):
        rb = ri_p[:, max_dis - d : max_dis - d + W]
        rgb = rg_p[:, max_dis - d : max_dis - d + W]
        cl = pcost(li, rb, lg, rgb)
        l_slices.append(jnp.where(x >= d, cl, l_border))
        lb = li_p[:, d : d + W]
        lgb = lg_p[:, d : d + W]
        cr = pcost(ri, lb, rg, lgb)
        r_slices.append(jnp.where(x < W - d, cr, r_border))
    return jnp.stack(l_slices), jnp.stack(r_slices)
