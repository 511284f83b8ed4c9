"""Fused (flash) multi-head attention Pallas kernel for TPU.

The SD/LDM UNet's 4096-token self-attention is the workload's hottest kernel
(SURVEY.md §3: ``CrossAttention`` einsum-softmax, attention.py:180-191); the
naive form materializes (B,H,T,T) logits in HBM, which is bandwidth-bound at
64x64 latents.  This kernel computes attention blockwise in VMEM with a
running-max/denominator (the standard flash/online-softmax recurrence), so
logits never leave the chip.

Layout: q (B, H, Tq, D), k/v (B, H, Tk, D); D is zero-padded to the 128-lane
width inside the caller.  Grid: (B*H, Tq / BLOCK_Q); each program streams the
full K/V for its (batch, head) in BLOCK_K chunks with fp32 accumulators.

Falls back to the einsum path off-TPU (tests run the kernel in interpret
mode for numerical parity).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 1024
BLOCK_K = 1024
_NEG_INF = -1e30
_DEFAULT_VMEM_LIMIT_MB = 96


def _vmem_limit_bytes() -> int:
    """Scoped-VMEM limit for the packed/folded kernels (single parse point).

    Mosaic's conservative scoped-VMEM estimate grows (weakly) with the
    leading grid extent and with the upstream producer's HLO layout: at
    hd=320 / (512, 2048) blocks it reads ~15.x MB at small b but 16.77 MB
    under a fused-qkv producer at b=8 and 16.8 MB at b=30 — over the 16 MB
    DEFAULT limit, though the kernels' actual live buffers total ~8 MB
    (double-buffered q/k/v/o blocks + fp32 scratch) and v5e has 128 MB
    physical VMEM.  Raising the limit lets the tuned block_k compile at
    every batch instead of degrading (the old b>8 -> block_k=1024 cap cost
    ~14% per image on the 30-candidate ensemble and still broke at b=8
    exactly: BENCH_r03 rc=1).  The env override exists so
    tools/preflight.py can prove it would catch the regression (set 16 to
    reproduce the r3 compile OOM).
    """
    raw = os.environ.get(
        "CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB", str(_DEFAULT_VMEM_LIMIT_MB))
    try:
        mb = int(raw)
    except ValueError:
        raise ValueError(
            "CYCLEDIFFUSION_FLASH_VMEM_LIMIT_MB must be an integer number of"
            f" megabytes, got {raw!r}") from None
    return mb * 1024 * 1024


def _kv_mask(bq: int, kb, block_k: int, nk: int, kv_actual: int):
    """-inf mask for zero-padded key columns, or None when nothing is padded
    (padded keys — e.g. a 77-token CLIP context padded to the 128-lane
    block — must not enter the softmax)."""
    if kv_actual >= block_k * nk:
        return None
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
    return col < kv_actual


def _mha_online_update(get_q, get_k, get_v, m_ref, l_ref, acc_ref, *,
                       sm_scale: float, num_heads: int, head_dim: int, mask):
    """One k-block online-softmax update for every head of a packed q-block.

    The single shared body of ``_packed_kernel`` / ``_folded_kernel`` /
    ``_qout_kernel`` (they differ only in where the (T, H*D) q/k/v values
    come from, abstracted by the per-head-slice getters).  Softmax state
    (m, l, acc) is carried in VMEM scratch across the kb grid walk.
    ``get_q/get_k/get_v`` take a lane ``slice`` and return the (rows, D)
    block for that head.
    """
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = get_q(sl)
        kh = get_k(sl)
        vh = get_v(sl)
        # scale the fp32 logits AFTER the matmul (scaling bf16 q first would
        # round the scaled operand)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (BQ, BK) fp32
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)
        m_prev = m_ref[:, h:h + 1]
        l_prev = l_ref[:, h:h + 1]
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new).astype(vh.dtype)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:, h:h + 1] = m_new
        # ones-augmented V: the PV matmul's padded output lanes are free, so
        # lane `head_dim` carries sum(p) — the softmax denominator rides the
        # MXU instead of costing a VPU reduction pass over (BQ, BK)
        v_aug = jnp.concatenate(
            [vh, jnp.ones((vh.shape[0], 1), vh.dtype)], axis=1)
        out_aug = jax.lax.dot_general(
            p, v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (BQ, D+1) fp32
        l_ref[:, h:h + 1] = l_prev * alpha + out_aug[:, head_dim:head_dim + 1]
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + out_aug[:, :head_dim]


def _normalize_acc(acc_ref, l_ref, *, num_heads: int, head_dim: int):
    """Divide each head's accumulator by its softmax denominator, in place."""
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        acc_ref[:, sl] = acc_ref[:, sl] / l_ref[:, h:h + 1]


def _project_flush(acc_ref, l_ref, wo_ref, bo_ref, o_ref, attn_dtype, *,
                   num_heads: int, head_dim: int):
    """Final flush for the folded variants: normalize, out-project, bias."""
    _normalize_acc(acc_ref, l_ref, num_heads=num_heads, head_dim=head_dim)
    attn = acc_ref[:].astype(attn_dtype)
    out = jax.lax.dot_general(
        attn, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                  kv_len: int, block_k: int, kv_actual: int):
    q = q_ref[0]                                         # (BQ, D) input dtype
    bq = q.shape[0]
    d = q.shape[1]

    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    num_kb = pl.cdiv(kv_len, block_k)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        # QK^T on the MXU in the input dtype with fp32 accumulation
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (BQ, BK) fp32
        if kv_actual < kv_len:
            # zero-padded keys (e.g. 77-token text context padded to the
            # 128-lane block) must not enter the softmax: mask them to -inf
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(col < kv_actual, s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        # p in the input dtype for the PV matmul (bf16 doubles MXU
        # throughput; the fp32 row-max subtraction keeps p in [0,1] where
        # bf16 error is ~1e-3; fp32 inputs keep full precision)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention_bhtd(q, k, v, sm_scale: float, *, interpret: bool = False):
    """q: (B,H,Tq,D), k/v: (B,H,Tk,D) -> (B,H,Tq,D).  Non-causal, no mask."""
    b, h, tq, d = q.shape
    tk = k.shape[2]

    d_pad = max(128, ((d + 127) // 128) * 128)
    block_q = min(BLOCK_Q, max(8, tq))
    block_k = min(BLOCK_K, ((tk + 127) // 128) * 128)
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    # padded q rows attend over real keys and are sliced away afterwards;
    # padded KEYS are masked to -inf inside the kernel (kv_actual), so
    # short contexts (77-token CLIP text) route here too
    tk_pad = ((tk + block_k - 1) // block_k) * block_k

    qp = _pad_to(_pad_to(q, d_pad, 3), tq_pad, 2).reshape(b * h, tq_pad, d_pad)
    kp = _pad_to(_pad_to(k, d_pad, 3), tk_pad, 2).reshape(b * h, tk_pad, d_pad)
    vp = _pad_to(_pad_to(v, d_pad, 3), tk_pad, 2).reshape(b * h, tk_pad, d_pad)

    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, kv_len=tk_pad, block_k=block_k,
        kv_actual=tk,
    )
    grid = (b * h, tq_pad // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                   sm_scale: float, num_heads: int, head_dim: int,
                   kv_actual: int, block_k: int):
    """All-heads-per-program flash attention on token-major (T, H*D) blocks.

    One program handles (batch b, q-block qi, k-block kb); the head loop is
    unrolled inside, slicing each head's d-lanes out of the packed block.
    Softmax state (m, l, acc) lives in VMEM scratch across the kb grid walk
    (the innermost, "arbitrary" grid dimension), so q/k/v never need the
    (B,H,T,D) transpose + d->128 pad round-trips through HBM that a
    head-major kernel forces (profiled at ~8.9 ms/step on the SD UNet).
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mask = _kv_mask(q_ref.shape[1], kb, block_k, nk, kv_actual)
    _mha_online_update(
        lambda sl: q_ref[0][:, sl],
        lambda sl: k_ref[0][:, sl],
        lambda sl: v_ref[0][:, sl],
        m_ref, l_ref, acc_ref,
        sm_scale=sm_scale, num_heads=num_heads, head_dim=head_dim, mask=mask)

    @pl.when(kb == nk - 1)
    def _flush():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[0, :, sl] = (
                acc_ref[:, sl] / l_ref[:, h:h + 1]
            ).astype(o_ref.dtype)


def flash_attention_packed(q, k, v, num_heads: int, sm_scale: float, *,
                           block_q: int = 512, block_k: int = 2048,
                           interpret: bool = False):
    """Token-major flash attention: q (B,Tq,H*D), k/v (B,Tk,H*D) -> same.

    Operates directly on the transformer's native packed layout — no head
    transpose, no d->128 HBM padding.  Requires H*D and the head slices to
    live on the lane axis (any H*D works; non-128-aligned head offsets cost
    in-register lane shifts only).
    """
    b, tq, hd = q.shape
    tk = k.shape[1]
    assert hd % num_heads == 0
    d = hd // num_heads

    block_q = min(block_q, max(8, tq))
    block_k = min(block_k, ((tk + 127) // 128) * 128)
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    tk_pad = ((tk + block_k - 1) // block_k) * block_k
    qp = _pad_to(q, tq_pad, 1)
    kp = _pad_to(k, tk_pad, 1)
    vp = _pad_to(v, tk_pad, 1)

    kernel = functools.partial(
        _packed_kernel, sm_scale=sm_scale, num_heads=num_heads, head_dim=d,
        kv_actual=tk, block_k=block_k,
    )
    grid = (b, tq_pad // block_q, tk_pad // block_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, qi, kb: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, qi, kb: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, max(128, num_heads)), jnp.float32),  # m
            pltpu.VMEM((block_q, max(128, num_heads)), jnp.float32),  # l
            pltpu.VMEM((block_q, hd), jnp.float32),                   # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # see _vmem_limit_bytes for why the 16 MB default is overridden
            vmem_limit_bytes=_vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :tq, :]


def _folded_kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
                   o_ref, q_scr, k_scr, v_scr, m_ref, l_ref, acc_ref, *,
                   sm_scale: float, num_heads: int, head_dim: int,
                   kv_actual: int, block_k: int):
    """Whole self-attention block per program: qkv + flash + out projection.

    Extends ``_packed_kernel`` by folding the surrounding matmuls into the
    kernel so the (B, T, H*D) q/k/v/attn-out tensors never round-trip HBM
    (reference producers: ``ldm/modules/attention.py:152-193`` to_q/to_k/
    to_v/to_out).  Grid (b, qi, kb) as before; per (b, qi) the q projection
    is computed once at kb==0 into scratch; per b the k/v projections are
    computed once during the qi==0 walk (one kb block per step) and cached
    in (Tk, H*D) scratch for every later q-block; the output projection +
    bias runs at the kb==nk-1 flush on the normalized accumulator.  Same
    FLOPs as the unfused path — only the HBM traffic changes.
    """
    qi = pl.program_id(1)
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q_scr[:] = jax.lax.dot_general(
            xq_ref[0], wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(q_scr.dtype)

    @pl.when(qi == 0)
    def _project_kv():
        xkv = xkv_ref[0]
        rows = pl.ds(kb * block_k, block_k)
        k_scr[rows, :] = jax.lax.dot_general(
            xkv, wk_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(k_scr.dtype)
        v_scr[rows, :] = jax.lax.dot_general(
            xkv, wv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(v_scr.dtype)

    rows = pl.ds(kb * block_k, block_k)
    mask = _kv_mask(q_scr.shape[0], kb, block_k, nk, kv_actual)
    _mha_online_update(
        lambda sl: q_scr[:, sl],
        lambda sl: k_scr[rows, sl],
        lambda sl: v_scr[rows, sl],
        m_ref, l_ref, acc_ref,
        sm_scale=sm_scale, num_heads=num_heads, head_dim=head_dim, mask=mask)

    @pl.when(kb == nk - 1)
    def _flush():
        _project_flush(acc_ref, l_ref, wo_ref, bo_ref, o_ref, q_scr.dtype,
                       num_heads=num_heads, head_dim=head_dim)


def _qout_kernel(xq_ref, k_ref, v_ref, wq_ref, wo_ref, bo_ref, o_ref,
                 q_scr, m_ref, l_ref, acc_ref, *, sm_scale: float,
                 num_heads: int, head_dim: int, kv_actual: int,
                 block_k: int):
    """Packed flash kernel with only the q and out projections folded.

    Unlike ``_folded_kernel`` this keeps k/v as precomputed inputs, so there
    is no cross-q-block scratch and the qi grid dimension stays parallel —
    the A/B seam between "fold everything" and "fold nothing" (PERF.md
    round-4: the full fold's qi serialization + x re-fetches cost more than
    the k/v HBM round-trips it saves).
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q_scr[:] = jax.lax.dot_general(
            xq_ref[0], wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(q_scr.dtype)

    mask = _kv_mask(q_scr.shape[0], kb, block_k, nk, kv_actual)
    _mha_online_update(
        lambda sl: q_scr[:, sl],
        lambda sl: k_ref[0][:, sl],
        lambda sl: v_ref[0][:, sl],
        m_ref, l_ref, acc_ref,
        sm_scale=sm_scale, num_heads=num_heads, head_dim=head_dim, mask=mask)

    @pl.when(kb == nk - 1)
    def _flush():
        _project_flush(acc_ref, l_ref, wo_ref, bo_ref, o_ref, q_scr.dtype,
                       num_heads=num_heads, head_dim=head_dim)


def qout_self_attention_block(x, wq, k, v, wo, bo, num_heads: int, *,
                              block_q: int = 512, block_k: int = 2048,
                              interpret: bool = False):
    """q/out-folded flash attention: x (B, T, C) normed tokens, k/v
    (B, Tk, H*D) precomputed -> (B, T, C) projected attention output."""
    b, tq, c = x.shape
    hd = wq.shape[1]
    tk = k.shape[1]
    assert hd % num_heads == 0
    d = hd // num_heads
    sm_scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, max(8, tq))
    block_k = min(block_k, ((tk + 127) // 128) * 128)
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    tk_pad = ((tk + block_k - 1) // block_k) * block_k
    xq = _pad_to(x, tq_pad, 1)
    kp = _pad_to(k, tk_pad, 1)
    vp = _pad_to(v, tk_pad, 1)
    bo2 = bo.reshape(1, c)

    kernel = functools.partial(
        _qout_kernel, sm_scale=sm_scale, num_heads=num_heads, head_dim=d,
        kv_actual=tk, block_k=block_k,
    )
    grid = (b, tq_pad // block_q, tk_pad // block_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, qi, kb: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda b, qi, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, c), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, qi, kb: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, hd), x.dtype),                       # q
            pltpu.VMEM((block_q, max(128, num_heads)), jnp.float32),  # m
            pltpu.VMEM((block_q, max(128, num_heads)), jnp.float32),  # l
            pltpu.VMEM((block_q, hd), jnp.float32),                   # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(xq, kp, vp, wq, wo, bo2)
    return out[:, :tq, :]


def fused_self_attention_block(x, wq, wk, wv, wo, bo, num_heads: int, *,
                               block_q: int = 512, block_k: int = 2048,
                               interpret: bool = False):
    """Folded self-attention block: x (B, T, C) of already-normed tokens ->
    ``(softmax(xWq (xWk)^T / sqrt(d)) xWv) Wo + bo`` of shape (B, T, C).

    The residual add stays with the caller.  wq/wk/wv: (C, H*D); wo:
    (H*D, C); bo: (C,).  All weights are cast to x.dtype by the caller.
    """
    b, tq, c = x.shape
    hd = wq.shape[1]
    assert hd % num_heads == 0
    d = hd // num_heads
    sm_scale = 1.0 / math.sqrt(d)
    tk = tq

    block_q = min(block_q, max(8, tq))
    block_k = min(block_k, ((tk + 127) // 128) * 128)
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    tk_pad = ((tk + block_k - 1) // block_k) * block_k
    xq = _pad_to(x, tq_pad, 1)
    xkv = _pad_to(x, tk_pad, 1)
    bo2 = bo.reshape(1, c)

    kernel = functools.partial(
        _folded_kernel, sm_scale=sm_scale, num_heads=num_heads, head_dim=d,
        kv_actual=tk, block_k=block_k,
    )
    grid = (b, tq_pad // block_q, tk_pad // block_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, qi, kb: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda b, qi, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, c), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, qi, kb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, qi, kb: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, hd), x.dtype),                       # q
            pltpu.VMEM((tk_pad, hd), x.dtype),                        # k
            pltpu.VMEM((tk_pad, hd), x.dtype),                        # v
            pltpu.VMEM((block_q, max(128, num_heads)), jnp.float32),  # m
            pltpu.VMEM((block_q, max(128, num_heads)), jnp.float32),  # l
            pltpu.VMEM((block_q, hd), jnp.float32),                   # acc
        ],
        compiler_params=pltpu.CompilerParams(
            # k/v scratch persists across the qi walk, so qi is sequential
            # ("arbitrary") too; see _vmem_limit_bytes for the limit note
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(xq, xkv, wq, wk, wv, wo, bo2)
    return out[:, :tq, :]


def attention_reference(q, k, v, sm_scale: float):
    """Naive einsum attention (fp32 softmax) — the fallback / oracle."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * sm_scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def multi_head_attention_fused(q, k, v, num_heads: int,
                               min_flash_tokens: int = 1024):
    """(B,T,H*D) attention dispatch: Pallas flash on TPU for long sequences,
    einsum otherwise.  Drop-in replacement for models.nn.multi_head_attention.
    """
    b, tq, width = q.shape
    tk = k.shape[1]
    d = width // num_heads
    sm_scale = 1.0 / math.sqrt(d)
    on_tpu = jax.default_backend() == "tpu"
    # escape hatch (read at trace time): lets bench.py retrace the chain on
    # the einsum path if a Pallas compile ever fails on the chip, so SOME
    # throughput number always lands (BENCH_r03 post-mortem)
    if os.environ.get("CYCLEDIFFUSION_NO_FLASH_ATTN") == "1":
        on_tpu = False

    # dispatch measured on v5e (tools/attn_probe.py, CFG batch 8):
    # * 4096-token self-attention: packed token-major kernel 3.3 ms vs
    #   head-major flash 4.5 ms vs einsum 11.7 ms — packed avoids the
    #   (B,H,T,D) transpose and d->128 HBM pad entirely;
    # * 1024-token self-attention: head-major flash wins (0.06 vs 0.12 ms);
    # * short-KV cross-attention (77-token CLIP context): fused einsum wins
    #   (0.05 vs 0.32 ms) — XLA keeps the small logits block fused.
    if on_tpu and tq >= 2 * min_flash_tokens and tk >= 512:
        return flash_attention_packed(q, k, v, num_heads, sm_scale)

    qh = q.reshape(b, tq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
    if on_tpu and tq >= min_flash_tokens and tk >= 512:
        out = flash_attention_bhtd(qh, kh, vh, sm_scale)
    else:
        out = attention_reference(qh, kh, vh, sm_scale)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, width)
