"""Pallas TPU convolution kernels for the GAN hot path.

The driver north star names these two fusions explicitly (BASELINE.json):
the generator's ConvTranspose(+BN)+ReLU up-blocks and the discriminator's
strided-conv+LeakyReLU down-blocks.  Both are built on the same idea —
decompose the stride-2 5×5 (de)convolution into its output/input parity
classes so every tap is a unit-stride slice feeding one MXU matmul, and fuse
the per-channel epilogue (bias / folded-BN scale+shift / activation) into the
accumulator while it is still in VMEM:

* `deconv5x5_s2(x, w, b, act, scale, shift)` — subpixel conv-transpose.
  Output parity plane (py,px) is Σ_taps P[m+s] @ W[k] with P = pad(x,(1,2))
  per spatial dim; tap table measured against `lax.conv_transpose` (k=5, s=2,
  SAME): even parity → {(s,k)} = {(0,1),(1,3)}, odd → {(0,0),(1,2),(2,4)}.
  The kernel writes a [B,H,2,W,2,C] tensor whose row-major layout IS the
  interleaved [B,2H,2W,C] image (free reshape outside).
* `conv5x5_s2_lrelu(x, w, b)` — matching-aware D down-block.  Taps read from
  a free parity-plane VIEW of pad(x,(2... )) so stride-2 input access becomes
  unit-stride: Y[m] = Σ_k P2[(k%2)][m + k//2] @ W[k].

Both are `custom_vjp`: forward is the Pallas kernel, backward re-uses the
`jax.vjp` of the equivalent `lax` composition (mathematically the same
function, so its VJP is exact, and XLA already generates optimal transpose
convs).  Equivalence (fwd + grad, all parities, odd shapes) is tested in
``tests/test_pallas_conv.py``; interpret mode on CPU, Mosaic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from text_to_image_tpu.ops.pallas.fused import _ACTS, _act_grad_from_output, _interpret

_DIMS = ("NHWC", "HWIO", "NHWC")

# parity → [(padded slice start, kernel tap index)], measured vs lax
# (O[2m] = X[m-1]·W1 + X[m]·W3; O[2m+1] = X[m-1]·W0 + X[m]·W2 + X[m+1]·W4,
# with X padded (1, 2) per spatial dim so every start is in range)
_DECONV_TAPS = {0: ((0, 1), (1, 3)), 1: ((0, 0), (1, 2), (2, 4))}


# ============================ deconv 5x5 s2 ==================================

def _deconv_kernel(xp_ref, w_ref, s_ref, t_ref, o_ref, *, h, wd, act):
    """xp [1,H+3,W+3,Cin] → o [1,H,2,W,2,TCO]: four parity matmul stacks
    with the epilogue act(acc·s + t) fused before the single store."""
    for py in (0, 1):
        for px in (0, 1):
            acc = None
            for sh, kh in _DECONV_TAPS[py]:
                for sw, kw in _DECONV_TAPS[px]:
                    a = xp_ref[0, sh:sh + h, sw:sw + wd, :]
                    a = a.reshape(h * wd, a.shape[-1])
                    part = jnp.dot(a, w_ref[kh, kw],
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            y = acc * s_ref[:] + t_ref[:]
            y = _ACTS[act](y).astype(o_ref.dtype)
            o_ref[0, :, py, :, px, :] = y.reshape(h, wd, y.shape[-1])


def _deconv_kernel_vpad(x_ref, w_ref, s_ref, t_ref, o_ref, *, h, wd, act):
    """As `_deconv_kernel` but (a) padding happens IN VMEM on the loaded
    block — the padded copy never exists in HBM — and (b) the block carries
    a batch tile so each parity matmul has bt·H·W rows (fills the 128-row
    MXU even at 4×4/8×8 feature maps)."""
    bt = x_ref.shape[0]
    xp = jnp.pad(x_ref[:], ((0, 0), (1, 2), (1, 2), (0, 0)))
    for py in (0, 1):
        for px in (0, 1):
            acc = None
            for sh, kh in _DECONV_TAPS[py]:
                for sw, kw in _DECONV_TAPS[px]:
                    a = xp[:, sh:sh + h, sw:sw + wd, :]
                    a = a.reshape(bt * h * wd, a.shape[-1])
                    part = jnp.dot(a, w_ref[kh, kw],
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            y = acc * s_ref[:] + t_ref[:]
            y = _ACTS[act](y).astype(o_ref.dtype)
            o_ref[:, :, py, :, px, :] = y.reshape(bt, h, wd, y.shape[-1])


def _deconv_pallas(xp, w, s2, t2, act: str, co_tile: int):
    b, hp, wp, cin = xp.shape
    h, wd = hp - 3, wp - 3
    co = w.shape[-1]
    n_co = co // co_tile
    out = pl.pallas_call(
        functools.partial(_deconv_kernel, h=h, wd=wd, act=act),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, wd, 2, co), xp.dtype),
        grid=(n_co, b),  # co slowest → weight block stays resident across batch
        in_specs=[
            pl.BlockSpec((1, hp, wp, cin), lambda c, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 5, cin, co_tile), lambda c, i: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, 2, wd, 2, co_tile),
                               lambda c, i: (i, 0, 0, 0, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 25 * b * h * wd * cin * co,
            bytes_accessed=(xp.size + w.size) * xp.dtype.itemsize
            + b * h * wd * 4 * co * xp.dtype.itemsize,
            transcendentals=0),
    )(xp, w, s2, t2)
    return out.reshape(b, 2 * h, 2 * wd, co)


def _pick_batch_tile(b: int, h: int, wd: int, cin: int, co_tile: int,
                     budget_bytes: int = 8 * 2**20) -> int:
    """Largest divisor batch tile whose in+out blocks fit VMEM alongside the
    weight block and the kernel's stack values (padded copy + f32 parity
    accumulators), targeting ≥128 matmul rows per parity.  The 8MB budget
    against the 16MB scoped-vmem limit leaves headroom for Mosaic's own
    staging (measured: 10MB overflowed by 80KB at batch 512)."""
    w_bytes = 25 * cin * co_tile * 2
    for bt in (16, 8, 4, 2, 1):
        if b % bt != 0:
            continue
        blk = bt * (h + 3) * (wd + 3) * cin * 2 + bt * h * wd * 4 * co_tile * 2
        stack = bt * (h + 3) * (wd + 3) * cin * 2 + bt * h * wd * co_tile * 4
        if w_bytes + 2 * blk + stack <= budget_bytes:
            return bt
    return 1


def _deconv_pallas_vpad(x, w, s2, t2, act: str, co_tile: int):
    """Unpadded-input variant: the kernel pads in VMEM, so HBM traffic is
    exactly one read of x + one write of y (+ weights)."""
    b, h, wd, cin = x.shape
    co = w.shape[-1]
    bt = _pick_batch_tile(b, h, wd, cin, co_tile)
    out = pl.pallas_call(
        functools.partial(_deconv_kernel_vpad, h=h, wd=wd, act=act),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, wd, 2, co), x.dtype),
        grid=(co // co_tile, b // bt),
        in_specs=[
            pl.BlockSpec((bt, h, wd, cin), lambda c, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 5, cin, co_tile), lambda c, i: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, 2, wd, 2, co_tile),
                               lambda c, i: (i, 0, 0, 0, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 25 * b * h * wd * cin * co,
            bytes_accessed=(x.size + w.size) * x.dtype.itemsize
            + b * h * wd * 4 * co * x.dtype.itemsize,
            transcendentals=0),
    )(x, w, s2, t2)
    return out.reshape(b, 2 * h, 2 * wd, co)


def _lax_deconv(x, w, s, t, act):
    y = lax.conv_transpose(x, w.astype(x.dtype), (2, 2), "SAME",
                           dimension_numbers=_DIMS,
                           preferred_element_type=x.dtype)
    y = y.astype(jnp.float32) * s + t
    return _ACTS[act](y).astype(x.dtype)


def _pick_co_tile(cin: int, co: int, budget_bytes: int = 8 * 2**20) -> int:
    """Largest divisor tile of co whose weight block fits the VMEM budget."""
    for tile in (co, 512, 256, 128):
        if tile <= co and co % tile == 0 and 25 * cin * tile * 2 <= budget_bytes:
            return tile
    return co  # small co (e.g. 3): take it whole


# Where the (1,2)-padding of the input is staged: "vmem" pads inside the
# kernel (no padded copy in HBM — measured faster, see BASELINE.md); "hbm"
# is the round-1 jnp.pad-then-call layout, kept for A/B measurement.
_DECONV_STAGING = "vmem"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _deconv_op(x, w, scale, shift, act: str):
    s2 = scale.reshape(1, -1).astype(jnp.float32)
    t2 = shift.reshape(1, -1).astype(jnp.float32)
    co_tile = _pick_co_tile(x.shape[-1], w.shape[-1])
    if _DECONV_STAGING == "vmem":
        return _deconv_pallas_vpad(x, w.astype(x.dtype), s2, t2, act, co_tile)
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    return _deconv_pallas(xp, w.astype(x.dtype), s2, t2, act, co_tile)


def deconv5x5_s2(x, w, scale, shift, act: str = "none"):
    """Fused ``act(conv_transpose(x, w, s=2, SAME)·scale + shift)``.

    scale/shift are per-channel f32 — (1, bias) for the plain train path,
    (BN-folded γ·rsqrt(σ²+ε), β−μ·…) for inference.  Differentiable in all
    array args (backward = exact VJP of the lax composition).

    Mosaic needs a 128-lane-aligned output channel dim for the interleaving
    store; other shapes (e.g. the RGB output layer) take the lax path.
    """
    if _interpret() or w.shape[-1] % 128 == 0:
        return _deconv_op(x, w, scale, shift, act)
    return _lax_deconv(x, w, scale.astype(jnp.float32),
                       shift.astype(jnp.float32), act)


def _deconv_fwd(x, w, scale, shift, act):
    y = _deconv_op(x, w, scale, shift, act)
    return y, (x, w, scale, shift, y)


def _raw_deconv(x, w):
    return lax.conv_transpose(x, w.astype(x.dtype), (2, 2), "SAME",
                              dimension_numbers=_DIMS,
                              preferred_element_type=x.dtype)


def _deconv_bwd(act, res, g):
    """No-recompute backward: the conv is linear in (x, w), so its adjoints
    come from `jax.linear_transpose` (two convs — exactly what XLA's native
    VJP emits); the epilogue derivative is recovered from the saved output
    (relu/lrelu/none invert where the gradient is nonzero; tanh falls back
    to a recompute VJP — only the lax-path RGB layer uses tanh anyway)."""
    x, w, scale, shift, y = res
    s32 = scale.astype(jnp.float32)
    t32 = shift.astype(jnp.float32)
    if act == "tanh":
        _, vjp = jax.vjp(lambda a, b, c, d: _lax_deconv(a, b, c, d, act),
                         x, w, s32, t32)
        dx, dw, ds, dt = vjp(g)
        return dx, dw, ds.astype(scale.dtype), dt.astype(shift.dtype)

    g32 = g.astype(jnp.float32) * _act_grad_from_output(act, y)
    y32 = y.astype(jnp.float32)
    # pre-activation value where the act-grad is nonzero (relu zeros it out)
    pre = y32 if act in ("none", "relu") else jnp.where(y32 >= 0, y32,
                                                        y32 / 0.2)
    d0 = jnp.where(g32 != 0, (pre - t32) / s32, 0.0)  # conv output
    d_conv = (g32 * s32).astype(x.dtype)

    t_x = jax.linear_transpose(lambda x_: _raw_deconv(x_, w), x)
    t_w = jax.linear_transpose(lambda w_: _raw_deconv(x, w_), w)
    dx, = t_x(d_conv)
    dw, = t_w(d_conv)
    ds = jnp.sum(g32 * d0, axis=(0, 1, 2)).astype(scale.dtype)
    dt = jnp.sum(g32, axis=(0, 1, 2)).astype(shift.dtype)
    return dx, dw.astype(w.dtype), ds.reshape(scale.shape), dt.reshape(shift.shape)


_deconv_op.defvjp(_deconv_fwd, _deconv_bwd)


# ===================== nearest-upsample2x + conv3x3 ==========================
#
# The StackGAN/PGGAN generator up-block is conv3x3(upsample2_nearest(x)).
# Nearest upsampling duplicates inputs, so the 3x3 taps over up(x) collapse
# per output parity to TWO taps over x with COMBINED weights:
#   y[2m+p] = Σ_di W[di+1]·up[2m+p+di], and up row (2m+p+di)//2 is
#     p=0: {x[m-1]: W0, x[m]: W1+W2},  p=1: {x[m]: W0+W1, x[m+1]: W2}
# (same per column).  That is 4 parities × 4 taps = 16 matmuls of x-sized
# operands — 16/36 of the FLOPs of the naive conv on the upsampled tensor,
# and the 4×-larger up(x) never exists in HBM.  Verified against the lax
# composition in tests/test_pallas_conv.py.

# parity → padded-x slice start for combined tap a ∈ {0, 1} (pad = 1)
_UPCONV_TAPS = {0: (0, 1), 1: (1, 2)}


def _combine_upconv_weights(w):
    """[3,3,ci,co] → [2,2,2,2,ci,co] indexed [py, px, a, b] (see above)."""
    rows = ((w[0], w[1] + w[2]), (w[0] + w[1], w[2]))     # [py][a]: [3,ci,co]
    blocks = []
    for py in (0, 1):
        row_px = []
        for px in (0, 1):
            taps = []
            for a in (0, 1):
                rw = rows[py][a]                          # [3(kw), ci, co]
                cols = ((rw[0], rw[1] + rw[2]),
                        (rw[0] + rw[1], rw[2]))[px]       # [b]: [ci, co]
                taps.append(jnp.stack(cols))              # [2(b), ci, co]
            row_px.append(jnp.stack(taps))                # [2(a), 2(b), ci, co]
        blocks.append(jnp.stack(row_px))                  # [2(px), ...]
    return jnp.stack(blocks)                              # [2(py), ...]


def _upconv_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, *, h, wd, act):
    bt = x_ref.shape[0]
    xp = jnp.pad(x_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
    for py in (0, 1):
        for px in (0, 1):
            acc = None
            for a in (0, 1):
                sh = _UPCONV_TAPS[py][a]
                for b in (0, 1):
                    sw = _UPCONV_TAPS[px][b]
                    arr = xp[:, sh:sh + h, sw:sw + wd, :]
                    arr = arr.reshape(bt * h * wd, arr.shape[-1])
                    part = jnp.dot(arr, w_ref[py, px, a, b],
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            y = acc * s_ref[:] + t_ref[:]
            y = _ACTS[act](y).astype(o_ref.dtype)
            o_ref[:, :, py, :, px, :] = y.reshape(bt, h, wd, y.shape[-1])


def _upconv_halo_kernel(xh_hbm, w_ref, s_ref, t_ref, o_ref, xs, sems, *,
                        th, wd, n_h, n_b, act):
    """Spatially-tiled variant for large feature maps: the row-padded input
    stays in HBM (memory space ANY) and each grid step DMAs its
    [th+2, wd, cin] row window — a 1-row halo on each side — into a
    double-buffered VMEM scratch, prefetching the next window while computing
    the current one.  Overlapping windows are not expressible with
    BlockSpecs, hence the manual copies.

    Two real-Mosaic constraints shape this kernel (both found by on-TPU
    compile failures, round 3):
    * the HBM input must NOT be width-padded — a DMA window over a
      (wd+2)-wide memref trips "slice must be aligned to tiling (8)";
      columns are padded here in VMEM instead (vector op, supported);
    * the column parity px is folded into the lane dim (output lanes are
      (px, co)-major, giving the same memory layout as the
      [..., wd, 2, co] interleave) so stores keep ≥128 lanes for co ≥ 64
      and avoid the 6-D `vector<1xTx1xWx1xC>` shape cast Mosaic rejects."""
    bi = pl.program_id(1)
    i = pl.program_id(2)
    flat = bi * n_h + i

    def dma(slot, b_, i_):
        return pltpu.make_async_copy(
            xh_hbm.at[b_, pl.ds(i_ * th, th + 2)], xs.at[slot],
            sems.at[slot])

    @pl.when(flat == 0)  # first tile of this co-pass: nothing prefetched yet
    def _():
        dma(0, bi, i).start()

    nxt = flat + 1

    @pl.when(nxt < n_b * n_h)
    def _():
        dma(nxt % 2, nxt // n_h, nxt % n_h).start()

    dma(flat % 2, bi, i).wait()
    xp = jnp.pad(xs[flat % 2], ((0, 0), (1, 1), (0, 0)))   # [th+2, wd+2, cin]
    cin = xp.shape[-1]
    for py in (0, 1):
        parts = []
        for px in (0, 1):
            acc = None
            for a in (0, 1):
                sh = _UPCONV_TAPS[py][a]
                for b2 in (0, 1):
                    sw = _UPCONV_TAPS[px][b2]
                    arr = xp[sh:sh + th, sw:sw + wd, :]
                    arr = arr.reshape(th * wd, cin)
                    part = jnp.dot(arr, w_ref[py, px, a, b2],
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            parts.append(acc)
        y = jnp.concatenate(parts, axis=-1)        # [th*wd, 2co] (px, co) lanes
        y = y * s_ref[:] + t_ref[:]
        y = _ACTS[act](y).astype(o_ref.dtype)
        o_ref[0, :, py, :, :] = y.reshape(th, wd, y.shape[-1])


def _pick_h_tile(h: int, wd: int, cin: int, co: int,
                 budget_bytes: int = 6 * 2**20) -> int:
    """Largest divisor row tile whose double-buffered scratch + in-kernel
    padded copy + output block fit the VMEM budget, targeting >=512 matmul
    rows per parity."""
    for th in (32, 16, 8, 4):
        if h % th != 0:
            continue
        scratch = 2 * (th + 2) * wd * cin * 2          # DMA double buffer
        padded = (th + 2) * (wd + 2) * cin * 2         # in-kernel width pad
        # bf16 output block + two live f32 parity accumulators per py pass
        out_blk = th * wd * 2 * co * 2 + 2 * th * wd * co * 4
        if scratch + padded + out_blk + 16 * cin * co * 2 <= budget_bytes:
            return th
    return 0


def _halo_padded_dims(cin: int, co: int) -> tuple[int, int]:
    """Channel dims the halo kernel actually runs at: cin must fill 128-lane
    registers for the HBM DMA windows; co must make the folded (px, co) lane
    dim a multiple of 128.  Zero-padded taps contribute nothing, so numerics
    are exact; the cin pad rides the same XLA copy that row-pads the input."""
    return -(-cin // 128) * 128, -(-co // 64) * 64


def _upconv_halo_pallas(x, w, s2, t2, act: str, th: int):
    b, h, wd, cin = x.shape
    co_out = w.shape[-1]
    cin_p, co = _halo_padded_dims(cin, co_out)
    wc = _combine_upconv_weights(w.astype(x.dtype))
    if co != co_out:
        wc = jnp.pad(wc, ((0, 0),) * 5 + ((0, co - co_out),))
        s2 = jnp.pad(s2, ((0, 0), (0, co - co_out)), constant_values=1.0)
        t2 = jnp.pad(t2, ((0, 0), (0, co - co_out)))
    if cin_p != cin:
        wc = jnp.pad(wc, ((0, 0),) * 4 + ((0, cin_p - cin), (0, 0)))
    # rows only: the width dim must stay sublane-aligned for the DMA windows
    xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, cin_p - cin)))
    cin = cin_p
    s4 = jnp.tile(s2, (1, 2))                    # (px, co)-major lane layout
    t4 = jnp.tile(t2, (1, 2))
    n_h = h // th
    out = pl.pallas_call(
        functools.partial(_upconv_halo_kernel, th=th, wd=wd, n_h=n_h, n_b=b,
                          act=act),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, wd, 2 * co), x.dtype),
        grid=(1, b, n_h),  # co untiled: the large-spatial layers are thin
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # row-padded x, HBM
            pl.BlockSpec((2, 2, 2, 2, cin, co),
                         lambda c, bi, i: (0, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * co), lambda c, bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * co), lambda c, bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, 2, wd, 2 * co),
                               lambda c, bi, i: (bi, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wd, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * b * h * wd * cin * co,
            bytes_accessed=(x.size + 16 * cin * co) * x.dtype.itemsize
            + b * h * wd * 4 * co * x.dtype.itemsize,
            transcendentals=0),
    )(xh, wc, s4, t4)
    # (b, h, 2, wd, 2co) with (px, co)-major lanes IS the row/column
    # interleave layout — a pure reshape recovers NHWC
    out = out.reshape(b, 2 * h, 2 * wd, co)
    return out[..., :co_out] if co != co_out else out


def _lax_upconv(x, w, s, t, act):
    b, h, wd, _ = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :],
                          (b, h, 2, wd, 2, x.shape[-1]))
    up = up.reshape(b, 2 * h, 2 * wd, x.shape[-1])
    y = lax.conv_general_dilated(up, w.astype(x.dtype), (1, 1), "SAME",
                                 dimension_numbers=_DIMS,
                                 preferred_element_type=x.dtype)
    y = y.astype(jnp.float32) * s + t
    return _ACTS[act](y).astype(x.dtype)


# ---- space-to-depth lax formulation (channel-thin large maps) ----------------
#
# The same parity collapse that drives the Pallas kernels can be handed to
# XLA whole: conv3x3(up2_nearest(x), w) == depth_to_space(conv3x3(x, W'))
# with W'[u, v, :, (py, px, co)] = Σ wc[py, px, a, b] over the taps (a, b)
# whose padded-input shift matches (u, v) (5/9 of each parity block is
# structurally zero).  Three properties make this the right form for the
# channel-thin high-res layers the round-5 serve sweep identified as the
# serving bound (BASELINE.md round 5, ~950 img/s flat at 6% MXU):
#   * the 4x-upsampled tensor never exists in HBM (XLA's native lowering of
#     up+conv materializes it — 537 MB at 128x128x64, B=64);
#   * the contraction writes 4*co channels at h x w — full 128-lane MXU
#     tiles where co<=32 layers otherwise run quarter-occupied;
#   * it is pure lax — no custom-VJP boundary, so XLA differentiates it and
#     fuses it jointly with a following BatchNorm (the boundary that makes
#     the Pallas kernels lose in bn_follows training graphs, round-4 A/B).
# MACs are 36/36 of the naive composition (zero-placed taps still multiply)
# vs the Pallas kernels' 16/36 — the bet, measured per shape in
# scripts/bench_pallas.py --upconv, is occupancy over MAC count.

def _s2d_upconv_weights(w):
    """[3,3,ci,co] → [3,3,ci,4co], output channels (py, px, co)-major."""
    wc = _combine_upconv_weights(w)                     # [2,2,2,2,ci,co]
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, ci, 4 * co), wc.dtype)
    for py in (0, 1):
        for px in (0, 1):
            for a in (0, 1):
                for b2 in (0, 1):
                    u, v = _UPCONV_TAPS[py][a], _UPCONV_TAPS[px][b2]
                    c0 = (py * 2 + px) * co
                    out = out.at[u, v, :, c0:c0 + co].set(wc[py, px, a, b2])
    return out


def upconv3x3_s2d(x, w, scale, shift, act: str = "none"):
    """``act(conv3x3(upsample2_nearest(x))·scale + shift)`` in
    space-to-depth form — pure lax, mathematically identical to
    `upconv3x3` / `_lax_upconv` (equivalence-tested fwd+grad in
    tests/test_pallas_conv.py)."""
    b, h, wd, _ = x.shape
    co = w.shape[-1]
    wp = _s2d_upconv_weights(w.astype(x.dtype))
    y4 = lax.conv_general_dilated(x, wp, (1, 1), "SAME",
                                  dimension_numbers=_DIMS,
                                  preferred_element_type=x.dtype)
    s4 = jnp.tile(scale.reshape(1, -1).astype(jnp.float32), (1, 4))
    t4 = jnp.tile(shift.reshape(1, -1).astype(jnp.float32), (1, 4))
    y4 = _ACTS[act](y4.astype(jnp.float32) * s4 + t4).astype(x.dtype)
    y4 = y4.reshape(b, h, wd, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y4.reshape(b, 2 * h, 2 * wd, co)


def upconv3x3_s2d_bias(x, w, bias, act: str = "none"):
    """Bias-epilogue variant of `upconv3x3_s2d` (BN follows outside)."""
    return upconv3x3_s2d(x, w, jnp.ones((w.shape[-1],), jnp.float32),
                         bias.astype(jnp.float32), act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _upconv_op(x, w, scale, shift, act: str):
    b, h, wd, cin = x.shape
    co = w.shape[-1]
    s2 = scale.reshape(1, -1).astype(jnp.float32)
    t2 = shift.reshape(1, -1).astype(jnp.float32)
    if h * wd > 1024:  # large maps: halo-tiled kernel (whole-image blocks
        # would blow VMEM); compiled callers gate on _pick_h_tile() > 0,
        # evaluated at the padded channel dims the kernel runs at
        th = _pick_h_tile(h, wd, *_halo_padded_dims(cin, co))
        if th == 0:   # interpret-mode corner (no divisor tile): same math
            return _lax_upconv(x, w, s2, t2, act)
        return _upconv_halo_pallas(x, w, s2, t2, act, th)
    wc = _combine_upconv_weights(w.astype(x.dtype))
    co_tile = _pick_co_tile(cin, co, budget_bytes=12 * 2**20)
    bt = _pick_batch_tile(b, h, wd, cin, co_tile)
    out = pl.pallas_call(
        functools.partial(_upconv_kernel, h=h, wd=wd, act=act),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, wd, 2, co), x.dtype),
        grid=(co // co_tile, b // bt),
        in_specs=[
            pl.BlockSpec((bt, h, wd, cin), lambda c, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 2, 2, cin, co_tile),
                         lambda c, i: (0, 0, 0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, 2, wd, 2, co_tile),
                               lambda c, i: (i, 0, 0, 0, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * b * h * wd * cin * co,
            bytes_accessed=(x.size + 16 * cin * co) * x.dtype.itemsize
            + b * h * wd * 4 * co * x.dtype.itemsize,
            transcendentals=0),
    )(x, wc, s2, t2)
    return out.reshape(b, 2 * h, 2 * wd, co)


def _upconv_fwd(x, w, scale, shift, act):
    y = _upconv_op(x, w, scale, shift, act)
    return y, (x, w, scale, shift, y)


# ---- parity-decomposed adjoints of conv3x3 ∘ upsample2_nearest ---------------
#
# The lax adjoint of this composition materializes the 4×-sized upsampled
# tensors in BOTH gradients — dx is a full 3×3 transpose-conv at 2H×2W
# followed by a 2×2 block-sum, dw correlates dy against up(x) — 144·BHW·ci·co
# MACs each.  The same parity collapse that drives the forward kernel applies
# to the adjoints (per spatial dim, with Cw the combined 2-tap weights):
#   y[2m+p]  = Σ_a Cw[p,a] · x[m + p + a − 1]                      (forward)
#   dx[m]    = Σ_{p,a} Cw[p,a]ᵀ · dy_p[m + 1 − p − a]              (adjoint x)
#   dCw[p,a] = Σ_m x[m + p + a − 1] ⊗ dy_p[m]                      (adjoint w)
# so dx is FOUR 2×2 convs over the dy parity planes (co→ci) and dw is
# SIXTEEN [BHW,ci]×[BHW,co] matmuls plus a constant 4×3 tap recombine —
# 32/144 of the lax-adjoint MACs each, with no upsampled intermediate in HBM.
# Equivalence vs the jax.vjp of the lax composition is tested in
# tests/test_pallas_conv.py.

# adjoint of the per-dim combine map Cw[p,a] = Σ_k T[p,a,k] W[k]
# (T rows: (0,0)→W0, (0,1)→W1+W2, (1,0)→W0+W1, (1,1)→W2)
_UNCOMBINE = ((((1.0, 0.0, 0.0), (0.0, 1.0, 1.0)),
               ((1.0, 1.0, 0.0), (0.0, 0.0, 1.0))))  # [p][a][k]


def _parity_planes(g):
    b, h2, w2, co = g.shape
    return g.reshape(b, h2 // 2, 2, w2 // 2, 2, co)


def _parity_dx(g, w, out_dtype):
    """Adjoint w.r.t. x of conv3x3(up2(x)) for cotangent g [B,2H,2W,co]."""
    wc = _combine_upconv_weights(w.astype(g.dtype))   # [py,px,a,b,ci,co]
    gp = _parity_planes(g)
    dx = None
    for py in (0, 1):
        for px in (0, 1):
            gpp = gp[:, :, py, :, px, :]
            # conv tap kh reads offset kh − py → kernel K[kh] = Cw[a=1−kh]ᵀ
            k = jnp.swapaxes(wc[py, px, ::-1, ::-1], -1, -2)  # [kh,kw,co,ci]
            part = lax.conv_general_dilated(
                gpp, k, (1, 1), ((py, 1 - py), (px, 1 - px)),
                dimension_numbers=_DIMS,
                preferred_element_type=jnp.float32)
            dx = part if dx is None else dx + part
    return dx.astype(out_dtype)


def _parity_dw(x, g, w_dtype):
    """Adjoint w.r.t. w of conv3x3(up2(x)) for cotangent g [B,2H,2W,co]."""
    gp = _parity_planes(g.astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    dwc = []
    for py in (0, 1):
        for px in (0, 1):
            gpp = gp[:, :, py, :, px, :]
            for a in (0, 1):
                sh = _UPCONV_TAPS[py][a]
                for b2 in (0, 1):
                    sw = _UPCONV_TAPS[px][b2]
                    xs = xp[:, sh:sh + h, sw:sw + wd, :]
                    dwc.append(jnp.einsum("bhwi,bhwo->io", xs, gpp,
                                          preferred_element_type=jnp.float32))
    ci, co = dwc[0].shape
    dwc = jnp.stack(dwc).reshape(2, 2, 2, 2, ci, co)  # [py,px,a,b,ci,co]
    t = jnp.asarray(_UNCOMBINE, jnp.float32)          # [p,a,k]
    dw = jnp.einsum("pqabio,pak,qbl->klio", dwc, t, t)
    return dw.astype(w_dtype)


def _upconv_bwd(act, res, g):
    """No-recompute backward: the epilogue derivative is recovered from the
    saved output for the invertible activations (tanh falls back to a
    recompute VJP); the conv adjoints use the parity decomposition above."""
    x, w, scale, shift, y = res
    s32 = scale.astype(jnp.float32)
    t32 = shift.astype(jnp.float32)
    if act == "tanh":
        _, vjp = jax.vjp(lambda a, b, c, d: _lax_upconv(a, b, c, d, act),
                         x, w, s32, t32)
        dx, dw, ds, dt = vjp(g)
        return (dx, dw.astype(w.dtype), ds.astype(scale.dtype),
                dt.astype(shift.dtype))

    g32 = g.astype(jnp.float32) * _act_grad_from_output(act, y)
    y32 = y.astype(jnp.float32)
    pre = y32 if act in ("none", "relu") else jnp.where(y32 >= 0, y32,
                                                       y32 / 0.2)
    d0 = jnp.where(g32 != 0, (pre - t32) / s32, 0.0)   # conv output
    d_conv = (g32 * s32).astype(x.dtype)

    dx = _parity_dx(d_conv, w, x.dtype)
    dw = _parity_dw(x, d_conv, w.dtype)
    ds = jnp.sum(g32 * d0, axis=(0, 1, 2)).astype(scale.dtype)
    dt = jnp.sum(g32, axis=(0, 1, 2)).astype(shift.dtype)
    return dx, dw, ds.reshape(scale.shape), dt.reshape(shift.shape)


_upconv_op.defvjp(_upconv_fwd, _upconv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _upconv_bias_op(x, w, b, act: str):
    co = w.shape[-1]
    return _upconv_op(x, w, jnp.ones((co,), jnp.float32),
                      b.astype(jnp.float32), act)


def _upconv_bias_fwd(x, w, b, act):
    y = _upconv_bias_op(x, w, b, act)
    return y, (x, w, y)


def _upconv_bias_bwd(act, res, g):
    """Bias-only backward: skips the scale-gradient pipeline entirely
    (a where/divide/reduce over the full output that the scale-less train
    path doesn't need — measured ~0.4 ms/step on Stage-I)."""
    x, w, y = res
    g32 = g.astype(jnp.float32) * _act_grad_from_output(act, y)
    d_conv = g32.astype(x.dtype)
    dx = _parity_dx(d_conv, w, x.dtype)
    dw = _parity_dw(x, d_conv, w.dtype)
    db = jnp.sum(g32, axis=(0, 1, 2))
    return dx, dw, db


_upconv_bias_op.defvjp(_upconv_bias_fwd, _upconv_bias_bwd)


def _upconv_supported(x, w) -> bool:
    """Static shape gate shared by `upconv3x3`/`upconv3x3_bias`: whole-image
    blocks for small maps (128-lane-aligned channels), halo-tiled rows for
    large maps (thin channels are zero-padded to the lane alignment —
    `_halo_padded_dims` — so only the width alignment and the VMEM budget
    gate the halo path)."""
    h, wd = x.shape[1], x.shape[2]
    cin, co = x.shape[-1], w.shape[-1]
    if h * wd <= 1024:
        return co % 128 == 0 and cin % 128 == 0
    # halo path: width must be sublane-aligned for the HBM DMA windows; the
    # VMEM budget is evaluated at the padded channel dims the kernel runs at
    return wd % 8 == 0 and _pick_h_tile(h, wd,
                                        *_halo_padded_dims(cin, co)) > 0


def upconv3x3_bias(x, w, b, act: str = "none"):
    """``act(conv3x3(upsample2_nearest(x)) + b)`` — the training-path
    up-block (no per-channel scale; BN follows outside).  Same fused kernel
    as `upconv3x3`, leaner backward."""
    if _interpret() or _upconv_supported(x, w):
        return _upconv_bias_op(x, w, b, act)
    return _lax_upconv(x, w, jnp.ones((w.shape[-1],), jnp.float32),
                       b.astype(jnp.float32), act)


def upconv3x3(x, w, scale, shift, act: str = "none"):
    """Fused ``act(conv3x3(upsample2_nearest(x))·scale + shift)`` — the
    StackGAN/PGGAN generator up-block.  Never materializes the upsampled
    tensor; combined-weight parity decomposition does 16/36 of the naive
    FLOPs.  w is the ordinary [3,3,cin,cout] kernel; scale/shift are
    per-channel f32 ((1, bias) plain, BN-folded for inference).
    Differentiable in all array args (backward = exact VJP of the lax
    composition).  Small maps use whole-image blocks (aligned channels);
    large maps use the halo-tiled row kernel; anything else → lax."""
    if _interpret() or _upconv_supported(x, w):
        return _upconv_op(x, w, scale, shift, act)
    return _lax_upconv(x, w, scale.astype(jnp.float32),
                       shift.astype(jnp.float32), act)


# ============================ conv 5x5 s2 + lrelu =============================

# tap k (0..4) reads parity plane k%2 at row offset k//2 of pad(x, (1, 3))
# viewed as [B, (H+4)/2, 2, (W+4)/2, 2, C]; measured vs lax.conv stride-2 SAME
_CONV_TAPS = tuple((k % 2, k // 2) for k in range(5))


def _conv_kernel(xp_ref, w_ref, b_ref, o_ref, *, h2, w2, act):
    acc = None
    for kh in range(5):
        ph, ah = _CONV_TAPS[kh]
        for kw in range(5):
            pw, aw = _CONV_TAPS[kw]
            a = xp_ref[0, ah:ah + h2, ph, aw:aw + w2, pw, :]
            a = a.reshape(h2 * w2, a.shape[-1])
            part = jnp.dot(a, w_ref[kh, kw],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = _ACTS[act](acc + b_ref[:]).astype(o_ref.dtype)
    o_ref[0] = y.reshape(h2, w2, y.shape[-1])


def _conv_kernel_vpad(x_ref, w_ref, b_ref, o_ref, *, h2, w2, act):
    """Pad + stride-2 tap extraction entirely in VMEM: tap (kh,kw) for output
    pixel (m,n) reads padded (2m+kh, 2n+kw).  Mosaic supports only 2D
    gathers, so instead of a 3D strided slice the padded block is reshaped to
    the parity view [Hq,2,Wq,2,C] in VMEM (a register regroup, no HBM
    traffic) and taps index fixed parities."""
    xp = jnp.pad(x_ref[0], ((1, 3), (1, 3), (0, 0)))
    cin = xp.shape[-1]
    hq, wq = xp.shape[0] // 2, xp.shape[1] // 2
    xp6 = xp.reshape(hq, 2, wq, 2, cin)
    acc = None
    for kh in range(5):
        ph, ah = _CONV_TAPS[kh]
        for kw in range(5):
            pw, aw = _CONV_TAPS[kw]
            a = xp6[ah:ah + h2, ph, aw:aw + w2, pw, :]
            a = a.reshape(h2 * w2, cin)
            part = jnp.dot(a, w_ref[kh, kw],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = _ACTS[act](acc + b_ref[:]).astype(o_ref.dtype)
    o_ref[0] = y.reshape(h2, w2, y.shape[-1])


def _conv_pallas_vpad(x, w, b2, act: str, co_tile: int):
    b, h, w_, cin = x.shape
    h2, w2 = h // 2, w_ // 2
    co = w.shape[-1]
    return pl.pallas_call(
        functools.partial(_conv_kernel_vpad, h2=h2, w2=w2, act=act),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, co), x.dtype),
        grid=(co // co_tile, b),
        in_specs=[
            pl.BlockSpec((1, h, w_, cin), lambda c, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 5, cin, co_tile), lambda c, i: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h2, w2, co_tile),
                               lambda c, i: (i, 0, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 25 * b * h2 * w2 * cin * co,
            bytes_accessed=(x.size + w.size) * x.dtype.itemsize
            + b * h2 * w2 * co * x.dtype.itemsize,
            transcendentals=0),
    )(x, w, b2)


def _conv_pallas(xp6, w, b2, act: str, co_tile: int):
    b, hq, _, wq, _, cin = xp6.shape
    h2, w2 = hq - 2, wq - 2
    co = w.shape[-1]
    out = pl.pallas_call(
        functools.partial(_conv_kernel, h2=h2, w2=w2, act=act),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, co), xp6.dtype),
        grid=(co // co_tile, b),
        in_specs=[
            pl.BlockSpec((1, hq, 2, wq, 2, cin),
                         lambda c, i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 5, cin, co_tile), lambda c, i: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h2, w2, co_tile),
                               lambda c, i: (i, 0, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 25 * b * h2 * w2 * cin * co,
            bytes_accessed=(xp6.size + w.size) * xp6.dtype.itemsize
            + b * h2 * w2 * co * xp6.dtype.itemsize,
            transcendentals=0),
    )(xp6, w, b2)
    return out


def _lax_conv_s2(x, w, b, act):
    y = lax.conv_general_dilated(x, w.astype(x.dtype), (2, 2), "SAME",
                                 dimension_numbers=_DIMS,
                                 preferred_element_type=x.dtype)
    return _ACTS[act]((y + b.astype(x.dtype)).astype(jnp.float32)).astype(x.dtype)


# Staging of the stride-2 tap access: "vmem" pads + strided-slices inside
# the kernel; "hbm" is the round-1 padded parity-plane view materialized by
# XLA before the call. Kept switchable for A/B measurement.
_CONV_STAGING = "vmem"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_op(x, w, b, act: str):
    bsz, h, w_, cin = x.shape
    b2 = b.reshape(1, -1).astype(jnp.float32)
    co_tile = _pick_co_tile(cin, w.shape[-1])
    if _CONV_STAGING == "vmem":
        return _conv_pallas_vpad(x, w.astype(x.dtype), b2, act, co_tile)
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xp6 = xp.reshape(bsz, (h + 4) // 2, 2, (w_ + 4) // 2, 2, cin)
    return _conv_pallas(xp6, w.astype(x.dtype), b2, act, co_tile)


def conv5x5_s2_act(x, w, b, act: str = "lrelu"):
    """Fused ``act(conv(x, w, s=2, SAME) + b)`` — the discriminator
    down-block.  Stride-2 taps become unit-stride reads of a free
    parity-plane view of the padded input.  H, W must be even (true for all
    power-of-two GAN resolutions); unaligned output channels take the lax
    path on TPU (Mosaic lane constraint)."""
    if _interpret() or w.shape[-1] % 128 == 0:
        return _conv_op(x, w, b, act)
    return _lax_conv_s2(x, w, b, act)


def _conv_fwd(x, w, b, act):
    return _conv_op(x, w, b, act), (x, w, b)


def _conv_bwd(act, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _lax_conv_s2(x_, w_, b_, act), x, w, b)
    return vjp(g)


_conv_op.defvjp(_conv_fwd, _conv_bwd)
