"""TPU Pallas sort engine: VMEM-blocked bitonic sort over int32 planes.

The build pipeline is extract -> SORT -> segmented union (see
ops/pipeline.py), replacing the reference's hashmaps (src/ska_dict.rs:76-113,
src/merge_ska_dict.rs:119-151) with sorted-array algebra. This module is an
OPT-IN alternative backend (SKA_TPU_SORT=pallas) that runs every stride
below a VMEM window size inside Pallas kernels.

Measured verdict on TPU v5e (8 x 4M uint64): XLA's stock `lax.sort` is
already near the VPU comparator-network bound — 110ms, almost independent
of key width or payload count — while these kernels land at 1.5-2.6x
slower because Mosaic pays heavy relayout costs on the cross-lane and
within-vreg-sublane compare-exchange strides (the 10 low index bits),
which dominate the O(n log^2 n) pass count. Non-comparison (radix) sorts
need a scatter primitive the TPU does not expose (only 128-wide lane
gather exists). The default build path therefore keeps lax.sort; this
engine remains as tested infrastructure and a record of the design space.

Representation: operands are split into 32-bit *planes* (TPU has no native
64-bit vectors). uint64 -> two sign-biased int32 planes (u32 ^ 0x80000000
reinterpreted as int32 orders identically to unsigned), int32 -> one plane,
bool -> one plane. The comparator is lexicographic over the key planes;
payload planes ride along in every compare-exchange.

Network: classic global bitonic — for stage mm = 1..log2(L), strides
j = mm-1..0, element i exchanges with i ^ 2^j, direction = bit mm of i.
Ties break by element index (the low-index side wins), which makes the
explicit equality term unnecessary: for a pair (a at low index, b at high),
swap_ascending = (b < a) strictly and swap_descending = not (b < a).
Data-independent and exact; NOT stable (callers must ensure key uniqueness
or key-completeness — the pipeline's dedup sort carries its key as the
entire payload and its count-filter sort keys on position).

Element layout is lane-major within 8K sub-blocks: element index =
sub_block * 8192 + lane * 64 + row. Strides 2^0..2^5 are then sublane
strides (pair-sliced, compares run once per pair), 2^6..2^12 are lane
strides (partner via in-register lane gather), and >= 2^13 are row strides
across sub-blocks (ref-sliced VMEM passes). Strides >= the window size run
as plain jnp compare-exchange passes (one fused HBM pass each).
"""

import functools
import os

from ..jaxinit import jax, jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 13  # sub-block = 8192 elements = (64, 128) lane-major
SUB_ROWS = 1 << (SUB - 7)  # 64
_BIAS = np.uint32(0x80000000)


# --------------------------------------------------------------------------
# comparators


def _lex_lt(a, b, nk):
    """Strict lexicographic a < b over the first nk planes (signed int32)."""
    lt = a[0] < b[0]
    eq = None
    for p in range(1, nk):
        eq = (a[p - 1] == b[p - 1]) if eq is None else (eq & (a[p - 1] == b[p - 1]))
        lt = lt | (eq & (a[p] < b[p]))
    return lt


def _lex_lt_eq(a, b, nk):
    lt = a[0] < b[0]
    eq = a[0] == b[0]
    for p in range(1, nk):
        lt = lt | (eq & (a[p] < b[p]))
        eq = eq & (a[p] == b[p])
    return lt, eq


def _pair_swap(a, b, nk, dirb):
    """Swap mask for a pair (a at the low index). dirb: descending bool
    (vector broadcastable to the pair shape). Ties keep (ascending) or
    swap (descending) — both valid orderings of equal keys."""
    bl = _lex_lt(b, a, nk)  # b strictly below a
    return jnp.logical_xor(bl, jnp.broadcast_to(dirb, bl.shape)) if isinstance(
        dirb, bool
    ) else jnp.logical_xor(bl, jnp.broadcast_to(dirb, bl.shape))


# --------------------------------------------------------------------------
# in-register passes on one sub-block (vals: list of (64, 128) int32,
# element index = lane * 64 + row)


def _ce_sub_row(vals, nk, j, dirb):
    """Sublane-stride pass (j <= 5): pairs (row, row + 2^j), same lane.
    dirb: (o, rs, 128) bool or scalar bool."""
    rs = 1 << j
    o = SUB_ROWS // (2 * rs)
    ys = [x.reshape(o, 2, rs, LANES) for x in vals]
    a = [y[:, 0] for y in ys]
    b = [y[:, 1] for y in ys]
    swap = _pair_swap(a, b, nk, dirb)
    out = []
    for ai, bi in zip(a, b):
        na = jnp.where(swap, bi, ai)
        nb = jnp.where(swap, ai, bi)
        out.append(jnp.concatenate([na[:, None], nb[:, None]], axis=1).reshape(SUB_ROWS, LANES))
    return out


def _ce_sub_lane(vals, nk, j, dirb, is_high, pidx):
    """Lane-stride pass (6 <= j <= 12): partner lane = lane ^ 2^(j-6),
    fetched with a pair of lane rotations (jnp.take_along_axis would work
    but forces i64 indices under x64, which Mosaic rejects). Both sides
    compute; ties resolve by index (low side wins), so keep =
    (self <' partner) ^ dir ^ is_high with <' the index-tiebroken order."""
    sl = 1 << (j - 6)
    partners = [
        jnp.where(
            is_high,
            pltpu.roll(x, shift=jnp.int32(sl), axis=1),
            pltpu.roll(x, shift=jnp.int32(LANES - sl), axis=1),
        )
        for x in vals
    ]
    lt, eq = _lex_lt_eq(vals, partners, nk)
    o = lt | (eq & ~is_high)  # self <' partner
    keep = jnp.logical_xor(jnp.logical_xor(o, jnp.broadcast_to(dirb, o.shape)), is_high)
    return [jnp.where(keep, v, p) for v, p in zip(vals, partners)]


def _run_sub_stages(vals, nk, stages, base, q, v):
    """Run bitonic (mm, js) stages entirely within one sub-block.

    base: traced int32 scalar — global element index of the sub-block
    start divided by 2^SUB (i.e. global sub-block number). Directions:
    bit mm of global index = bit (mm - SUB) of `base` for mm >= SUB,
    else a vector from the local index."""
    lrow = jax.lax.broadcasted_iota(jnp.int32, (SUB_ROWS, LANES), 0)
    llane = jax.lax.broadcasted_iota(jnp.int32, (SUB_ROWS, LANES), 1)
    lidx = llane * SUB_ROWS + lrow  # local element index within sub-block
    for mm, js in stages:
        if mm >= SUB:
            dir_full = (jnp.right_shift(base, mm - SUB) & 1) != 0
        else:
            dir_full = (jnp.right_shift(lidx, mm) & 1) != 0
        for j in js:
            if j <= 5:
                if mm >= SUB:
                    dirb = dir_full
                else:
                    rs = 1 << j
                    o = SUB_ROWS // (2 * rs)
                    dirb = (
                        (jnp.right_shift(lidx.reshape(o, 2, rs, LANES)[:, 0], mm) & 1)
                        != 0
                    )
                vals = _ce_sub_row(vals, nk, j, dirb)
            else:
                sl = 1 << (j - 6)
                is_high = (llane & sl) != 0
                dirb = dir_full if mm >= SUB else ((jnp.right_shift(lidx, mm) & 1) != 0)
                vals = _ce_sub_lane(vals, nk, j, dirb, is_high, None)
    return vals


# --------------------------------------------------------------------------
# kernels


def body_w(f):
    """Adapt an (i)->i+1 body to lax.while_loop over an int32 counter
    (fori_loop lowers to scan whose internal i64 counter under x64 Mosaic
    cannot legalize)."""
    return lambda i: f(i)


def _window_kernel_body(refs, *, NP, nk, v, sub_stage_plan, win_rows):
    """refs = in planes + out planes, block shape (1, win_rows, 128).

    Executes the sub_stage_plan: ("sub", [(mm, js)...]) items loop over
    8K sub-blocks; ("ref", mm, j) items are row-stride passes (j >= SUB)
    over the VMEM window via dynamic slices. q = window index in the row.
    """
    ins = refs[:NP]
    outs = refs[NP:]
    q = pl.program_id(1)
    n_sub = win_rows // SUB_ROWS
    sub_per_win = n_sub  # = 2^(v - SUB)

    for i in range(NP):
        outs[i][:] = ins[i][:]

    for item in sub_stage_plan:
        if item[0] == "sub":
            _, sub_stages = item

            def body(sb, sub_stages=sub_stages):
                r0 = pl.multiple_of(sb * SUB_ROWS, SUB_ROWS)
                vals = [outs[i][0, pl.ds(r0, SUB_ROWS), :] for i in range(NP)]
                base = q * sub_per_win + sb
                vals = _run_sub_stages(vals, nk, sub_stages, base, q, v)
                for i in range(NP):
                    outs[i][0, pl.ds(r0, SUB_ROWS), :] = vals[i]
                return sb + 1

            jax.lax.while_loop(lambda i: i < n_sub, body_w(body), jnp.int32(0))
        else:
            _, mm, j = item
            # row-stride pass across sub-blocks: stride 2^j, SUB <= j < v;
            # element bit j..  = sub-block bit (j - SUB) => row distance
            d_rows = 1 << (j - 7)
            unit = min(SUB_ROWS, d_rows)
            npb_log = (j - 7) - int(np.log2(unit))  # d_rows/unit
            n_blocks = win_rows // (2 * d_rows)
            total = n_blocks << npb_log
            if mm >= v:
                dglobal = (jnp.right_shift(q, mm - v) & 1) != 0
            else:
                dglobal = None

            def body(p, d_rows=d_rows, unit=unit, npb_log=npb_log, mm=mm, dglobal=dglobal):
                blk = jnp.right_shift(p, npb_log)
                off = p & ((1 << npb_log) - 1)
                ra = pl.multiple_of(blk * 2 * d_rows + off * unit, unit)
                rb = ra + d_rows
                a = [outs[i][0, pl.ds(ra, unit), :] for i in range(NP)]
                b = [outs[i][0, pl.ds(rb, unit), :] for i in range(NP)]
                if dglobal is None:
                    # dir = bit mm of global index; block spans 2^(j+1)
                    # elements aligned to its size, so it is constant
                    gbit = jnp.right_shift(blk * (2 * d_rows * LANES), mm) & 1
                    dirb = gbit != 0
                else:
                    dirb = dglobal
                swap = _pair_swap(a, b, nk, dirb)
                for i in range(NP):
                    na = jnp.where(swap, b[i], a[i])
                    nb = jnp.where(swap, a[i], b[i])
                    outs[i][0, pl.ds(ra, unit), :] = na
                    outs[i][0, pl.ds(rb, unit), :] = nb
                return p + 1

            jax.lax.while_loop(lambda i: i < total, body_w(body), jnp.int32(0))


def _build_plan(v, mm_list):
    """Order ref passes (j >= SUB) and batch low strides per-mm into sub
    loops; consecutive all-low stages share one sub loop."""
    plan = []
    pending_sub = []
    for mm in mm_list:
        js = list(range(min(mm, v) - 1, -1, -1))
        ref_js = [j for j in js if j >= SUB]
        low_js = [j for j in js if j < SUB]
        if not ref_js:
            pending_sub.append((mm, low_js))
            continue
        if pending_sub:
            plan.append(("sub", tuple(pending_sub)))
            pending_sub = []
        for j in ref_js:
            plan.append(("ref", mm, j))
        if low_js:
            plan.append(("sub", ((mm, low_js),)))
    if pending_sub:
        plan.append(("sub", tuple(pending_sub)))
    return plan


@functools.lru_cache(maxsize=None)
def _window_call(B, n_rows, NP, nk, v, mm_lo, mm_hi, interpret):
    """pallas_call running bitonic stages mm_lo..mm_hi (strides < 2^v) on
    (B, n_rows, 128) int32 planes. Window = 2^v elements."""
    win_rows = 1 << (v - 7)
    n_win = n_rows // win_rows
    plan = _build_plan(v, list(range(mm_lo, mm_hi + 1)))
    kernel = functools.partial(
        _window_kernel_body, NP=NP, nk=nk, v=v, sub_stage_plan=plan, win_rows=win_rows
    )

    def wrapped(*refs):
        kernel(refs)

    # the trailing 0 must be int32: under x64 a python 0 traces as i64,
    # which Mosaic's index-map lowering rejects
    spec = pl.BlockSpec(
        (1, win_rows, LANES),
        lambda s, q: (s, q, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    shape = jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.int32)
    return pl.pallas_call(
        wrapped,
        grid=(B, n_win),
        in_specs=[spec] * NP,
        out_specs=[spec] * NP,
        out_shape=[shape] * NP,
        interpret=bool(interpret),
    )


def _ce_jnp(planes, nk, j, mm):
    """Cross-window compare-exchange at stride 2^j (one fused HBM pass).
    planes: list of (B, L) int32."""
    B, L = planes[0].shape
    s = 1 << j
    o = L // (2 * s)
    ys = [x.reshape(B, o, 2, s) for x in planes]
    a = [y[:, :, 0] for y in ys]
    b = [y[:, :, 1] for y in ys]
    bl = _lex_lt(b, a, nk)
    dirb = ((jnp.arange(o, dtype=jnp.int32) >> (mm - j - 1)) & 1) != 0
    swap = jnp.logical_xor(bl, dirb[None, :, None])
    out = []
    for ai, bi in zip(a, b):
        na = jnp.where(swap, bi, ai)
        nb = jnp.where(swap, ai, bi)
        out.append(jnp.stack([na, nb], axis=2).reshape(B, L))
    return out


def bitonic_sort_planes(planes, nk, *, v=None, interpret=False):
    """Sort (B, L) int32 planes ascending by the first nk planes.

    L must be a power of two >= 2^SUB. Unstable (index-tiebroken network).
    """
    planes = list(planes)
    B, L = planes[0].shape
    n = int(np.log2(L))
    assert (1 << n) == L and n >= SUB, (L, n)
    NP = len(planes)
    if v is None:
        # VMEM budget ~ 2 * NP * 2^v * 4B (in+out blocks) <= ~8MB
        v = 18 if NP <= 2 else (17 if NP <= 4 else 16)
    v = min(v, n)
    n_rows = L // LANES

    def to3(x):
        return x.reshape(B, n_rows, LANES)

    def to2(x):
        return x.reshape(B, L)

    # element order is lane-major within sub-blocks; physical (row, lane)
    # layout never changes — only the pass patterns interpret indices.
    call = _window_call(B, n_rows, NP, nk, v, 1, v, interpret)
    planes = [to2(x) for x in call(*[to3(x) for x in planes])]

    for mm in range(v + 1, n + 1):
        for j in range(mm - 1, v - 1, -1):
            planes = _ce_jnp_lane_major(planes, nk, j, mm, v)
        call = _window_call(B, n_rows, NP, nk, v, mm, mm, interpret)
        planes = [to2(x) for x in call(*[to3(x) for x in planes])]

    # restore standard (ascending position = ascending value) order
    return [_from_lane_major(x) for x in planes]


def _ce_jnp_lane_major(planes, nk, j, mm, v):
    # strides >= 2^v exceed the window; those element-index bits map to
    # window-number bits regardless of the lane-major shuffle inside
    # sub-blocks, so the plain reshape pass applies unchanged.
    return _ce_jnp(planes, nk, j, mm)


def _from_lane_major(x):
    """Undo the lane-major element order: logical element index
    b*8192 + lane*64 + row  ->  physical (row-major) position."""
    B, L = x.shape
    nb = L // (1 << SUB)
    y = x.reshape(B, nb, SUB_ROWS, LANES)  # [b, row, lane]
    y = jnp.swapaxes(y, 2, 3)  # [b, lane, row] = ascending logical order
    return y.reshape(B, L)


def _to_lane_major(x):
    B, L = x.shape
    nb = L // (1 << SUB)
    y = x.reshape(B, nb, LANES, SUB_ROWS)
    y = jnp.swapaxes(y, 2, 3)
    return y.reshape(B, L)


# --------------------------------------------------------------------------
# lax.sort-compatible wrapper over u64/int32/bool operands


def _use_pallas():
    mode = os.environ.get("SKA_TPU_SORT", "auto")
    if mode == "lax":
        return False
    if mode == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _to_planes(x):
    """Split one (B, L) operand into biased int32 planes + tag."""
    if x.dtype == jnp.uint64:
        hi = jax.lax.bitcast_convert_type(
            (x >> jnp.uint64(32)).astype(jnp.uint32) ^ _BIAS, jnp.int32
        )
        lo = jax.lax.bitcast_convert_type(x.astype(jnp.uint32) ^ _BIAS, jnp.int32)
        return [hi, lo], "u64"
    if x.dtype == jnp.int32:
        return [x], "i32"
    if x.dtype == jnp.bool_:
        return [x.astype(jnp.int32)], "bool"
    raise TypeError(f"unsupported operand dtype {x.dtype}")


def _from_planes(planes, tag):
    if tag == "u64":
        hi = jax.lax.bitcast_convert_type(planes[0], jnp.uint32) ^ _BIAS
        lo = jax.lax.bitcast_convert_type(planes[1], jnp.uint32) ^ _BIAS
        return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    if tag == "i32":
        return planes[0]
    if tag == "bool":
        return planes[0] != 0
    raise AssertionError(tag)


def sort_ops(ops, num_keys, *, interpret=False):
    """Drop-in for jax.lax.sort(ops, num_keys=...) on (B, L) or (L,)
    operands of dtype uint64/int32/bool, ascending along the last axis.

    NOT stable — callers must ensure key uniqueness or key-completeness
    (all pipeline sorts do: the dedup sort's payload is its key, and the
    count-filter sort keys on position). Falls back to lax.sort off-TPU
    or for non-power-of-two / small lengths.
    """
    ops = tuple(ops)
    L = ops[0].shape[-1]
    pow2 = (L & (L - 1)) == 0
    if not (_use_pallas() or interpret) or not pow2 or L < (1 << SUB):
        return jax.lax.sort(ops, num_keys=num_keys, dimension=-1, is_stable=False)

    squeeze = ops[0].ndim == 1
    planes = []
    tags = []
    spans = []
    nk_planes = 0
    for i, x in enumerate(ops):
        if squeeze:
            x = x[None, :]
        p, tag = _to_planes(x)
        spans.append((len(planes), len(planes) + len(p)))
        planes.extend(p)
        tags.append(tag)
        if i < num_keys:
            nk_planes = len(planes)

    planes = bitonic_sort_planes(planes, nk_planes, interpret=interpret)

    out = []
    for (a, b), tag in zip(spans, tags):
        y = _from_planes(planes[a:b], tag)
        out.append(y[0] if squeeze else y)
    return tuple(out)
