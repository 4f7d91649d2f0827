"""Fused Pallas TPU kernel for masked MaxSim late-interaction scoring.

score[q, d] = sum_n qmask[q,n] * max_m(valid) <Q[q,n], P[d,m]>, with docs that
have no valid token scoring 0 (semantics of reference
``evaluator/retrieval.py:166-213``; see ``evdr_tpu.ops.maxsim`` for the oracle).

Kernel design (TPU-first, not a translation):

- Q is flattened to (nq*Lq, D): query tokens are contiguous per query, so a
  row-block of QB*Lq rows holds QB whole queries.
- grid = (q_blocks, doc_blocks, lp_tiles); for each program we compute ONE
  MXU matmul  sim = Qblk (QBL, D) @ Pblk^T (D, DB*TLP)  in fp32 accumulation
  (bf16 inputs by default), then a per-doc segmented running max into a VMEM
  scratch accumulator acc (QBL, DB) that persists across the innermost
  lp_tiles grid dimension. The (Q, C, Lq, Lp) similarity tensor never touches
  HBM — this is the whole point vs. the chunked einsum.
- doc-token validity masks are pre-tiled host-side into the kernel's
  (doc_block, lp_tile) layout so the kernel applies them with a plain 2D
  ``where`` (no in-kernel gather/reshape of masks).
- after the last lp tile: docs whose accumulator never saw a valid token are
  zeroed (doc_has_token rule), the query mask is applied, and the sum over
  each query's Lq tokens runs as a pure-VPU segmented sum — token-major
  lane-sliced tree when the tiling allows it, sublane transpose+reduce
  otherwise (see ``_finish_sum`` for the full epilogue study; the original
  fp32-HIGHEST selector matmul capped the whole kernel at small Lp).

The kernel is wrapped in ``jax.custom_vjp``: backward recomputes gradients via
the XLA oracle (max-grad scatters to the argmax token), keeping training
differentiable while eval/serving uses the fused forward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evdr_tpu.ops.maxsim import maxsim_xla as _maxsim_xla

NEG_INIT = -1e30  # running-max init; any real (even unnormalized) sim beats it
NEG_THRESH = -1e29  # acc below this => doc had no valid token => score 0


def _nt_layout(epilogue: str) -> bool:
    """Token-major epilogues that store (DB, QB) blocks (transposed in XLA)."""
    return (epilogue.startswith("tok") and epilogue != "tokmajor"
            and not epilogue.startswith("tokfuse"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_rows(nq: int, lq: int, floor: int = 4096, cap: int = 8192) -> int:
    """Auto target_rows: cover the WHOLE query batch in ONE q-block.

    Every kernel re-streams the index from HBM once per q-block, so at
    HBM-bound shapes n_qb=1 is strictly best. Chip sweeps (v5e, 250k docs,
    256q x 32t = qbl 8192, 8/19): int8full 170.1 TFLOP/s at rows=8192 vs
    154.0 at the old 4096 default and 120.8 at the rows=2048 serving
    workaround (i8f_sweep_smalllp.out); bf16 168.7 vs 163.2
    (bf16_sweep_smalllp.out, rows=16384 within noise of 8192 — the q-block
    clamps to the padded batch anyway); PQ +40-48% at every swept Lp
    (pq_sweep_*.out — there the q-block also repeats the decode).
    QBL=8192 is the largest measured-legal scope across kernels; the
    4096 floor keeps small batches on the proven tiling."""
    qbl_full = _round_up(max(nq, 8), 8) * _round_up(lq, 8)
    return int(min(max(floor, qbl_full), cap))


def _pick_tiles(lq: int, lp: int, target_rows: int = 512, target_cols: int = 256,
                nq: int = None, max_tlp: int = None) -> Tuple[int, int, int, int]:
    """Choose (QB queries/block, Lq_pad, DB docs/block, TLP lp-tile).

    QB is a multiple of 8 so the (QB, DB) output block satisfies the TPU
    sublane constraint. When ``nq`` is given, QB is clamped to the padded
    query count: a 4096-row tile at nq=64/lq=32 would otherwise pad the
    query axis 2x and do double the MXU work (measured: config-5b exact
    dropped 1,033 -> 621 q/s when the r4096 default landed unclamped).

    ``max_tlp`` caps the lp-tile so long-doc shapes split Lp across several
    contraction steps per doc block: (tlp=384, db=8) streams the same bytes
    per step as (tlp=768, db=4) but runs the Lq-sum epilogue half as often
    AND makes db a multiple of 8, the token-major epilogue's legality gate.
    """
    lq_pad = _round_up(lq, 8)
    qb = max(8, (target_rows // lq_pad) // 8 * 8)
    if nq is not None:
        qb = min(qb, max(8, _round_up(nq, 8)))
    tlp = min(target_cols, _round_up(lp, 16))
    if max_tlp is not None:
        # round DOWN so the cap is honored (a VMEM-motivated cap that grew
        # to the next multiple of 16 could still OOM); floor at 16 = the
        # lane-tile legality minimum
        tlp = min(tlp, max(16, max_tlp // 16 * 16))
    db = max(1, target_cols // tlp)
    return qb, lq_pad, db, tlp


def _finish_sum(weighted, db, qb, lq_pad, epilogue):
    """Sum each query's Lq token maxima: (DB, QBL) -> (DB, QB).

    Measured on the v5e chip at the config-5 shape (Lp=16, 250k docs,
    256q x 32t, d=128) — the shape where this epilogue dominates, because
    it runs once per (q-block, doc-block) and Lp=16 means only ONE
    contraction step amortizes it:

    - 'tokmajor' (auto-DEFAULT when qb%128==0 and db%8==0): the q-block is
      flattened TOKEN-major (lane = t*qb + q_local), so the segmented sum is
      a tree of lane-tile-ALIGNED slice adds with zero relayout; only the
      small (DB, QB) result is transposed in-kernel. EXACT. bf16 161.6,
      int8full ~153, int8-index 160.1 TFLOP/s.
    - 'tokmajor_nt': same minus the small transpose — (DB, QB) blocks are
      stored doc-major and the DRIVER transposes in XLA. Best at the kernel
      level (bf16 163.1, int8full 155.5) but the driver-side transpose of
      the full score matrix costs ~18% end-to-end at 1M pages (config 5
      771 -> 631 q/s), so 'tokmajor' is the default instead.
    - 'tokpre'/'tokchain': q-weight row applied pre-max / chain over acc
      slices. bf16 160.0 / int8full 142.9 (the pre-max mul does not amortize
      in the int8 stream); kept for study. 'tokN' = profiling probes (WRONG
      results) that exposed the tree's VMEM-traffic scaling (int8full tok1
      299 -> tok32 155 TFLOP/s: the epilogue is VMEM-bandwidth-bound, not
      op-count-bound).
    - 'sublane' (auto-fallback; always legal): pure-VPU segmented sum — one
      transpose (which replaces the caller's output transpose), then a
      layout-preserving leading-dim reshape + sum, the same pattern as the
      kernel's per-doc blockmax. EXACT (max rel diff 2e-7 vs 'f32'). bf16
      146.2, int8full 138.2 TFLOP/s at the config-5 shape; at the headline
      shape (Lp=768 -> db=4, token-major illegal) int8full 158.9 — there the
      epilogue is amortized over 48 contraction steps and sublane is best.
    - 'f32': selector matmul in fp32 HIGHEST — exact, but HIGHEST runs the
      MXU in multi-pass mode; at small Lp it caps BOTH kernels at
      ~111 TFLOP/s, and Mosaic fails to compile it at target_rows=4096
      inside the int8 kernel.
    - 'bf16': selector matmul with bf16 inputs / DEFAULT precision — one
      MXU pass, ~same speed as 'sublane' on the bf16 kernel but with bf16
      rounding on the sum; Mosaic CRASHES on it inside the int8-dot kernel.
    - 'f32d' / 'reduce': correct in interpret mode but fail to compile on
      the TPU (Mosaic: excess-precision f32 dot / lane-axis reshape).
    - 'none': profiling ceiling only — skips the sum (wrong results);
      bf16 151.5, int8full 258.2 TFLOP/s (query-major layout).

    - 'tokfuse{G}' (see ``_fused_tree_sum``): where+qmask-mul fused into
      tree level 0 with a G-term chain per level-0 partial — strictly less
      VMEM traffic than 'tokmajor' (never materializes the full-width
      weighted buffer; ~5.5 vs ~13.5 MB per emit at the config-5 int8full
      tiling). Chip numbers pending (queued tunnel probes).

    Ruled out for the remaining int8 small-Lp gap (155 vs the 258 ceiling):
    a bf16-relayout sublane variant (half the transpose bytes; SLOWER and
    1.2% top-1 disagreement); the deferred-epilogue grid even with the
    token-major tree (150.8 vs 155.4 in-step); and the single-lp-tile
    scratch-BYPASS direct path (int8full 135.9, bf16 158.8 — the acc
    round-trip HELPS Mosaic pipeline the finish across grid steps).
    """
    qbl = qb * lq_pad
    if epilogue == "none":
        return jnp.zeros((db, qb), jnp.float32) + weighted[:, :qb]
    if epilogue == "tokmajor":
        # q-block is flattened TOKEN-major (lane index = t*qb + q_local), so
        # each query's Lq terms live in lq_pad lane-ALIGNED slices of width
        # qb: the segmented sum is a tree of plain VPU adds with ZERO
        # relayout (vs. 'sublane', which transposes the whole (DB, QBL)
        # block). Only the small (DB, QB) result is transposed at the end
        # (lq_pad x fewer relayout bytes). Requires qb % 128 == 0 for
        # lane-tile-aligned slices; callers fall back to 'sublane' otherwise.
        parts = [weighted[:, t * qb:(t + 1) * qb] for t in range(lq_pad)]
        while len(parts) > 1:
            nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
            if len(parts) % 2:
                nxt.append(parts[-1])
            parts = nxt
        return jnp.transpose(parts[0])  # (QB, DB), pre-transposed
    if epilogue == "tokmajor_nt" or (epilogue.startswith("tok")
                                     and epilogue[3:].isdigit()):
        # 'tokmajor' minus the final small transpose: the (DB, QB) result is
        # stored doc-major and the caller transposes in XLA outside the
        # kernel (one extra HBM round-trip of the output, ~negligible vs the
        # scoring stream). 'tokN' (N an int) sums only the first N lane
        # slices — WRONG results, profiling-only: isolates how the epilogue
        # cost scales with the slice-add count.
        n_parts = int(epilogue[3:]) if epilogue[3:].isdigit() else lq_pad
        parts = [weighted[:, t * qb:(t + 1) * qb] for t in range(n_parts)]
        while len(parts) > 1:
            nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
            if len(parts) % 2:
                nxt.append(parts[-1])
            parts = nxt
        return parts[0]  # (DB, QB), untransposed
    if epilogue == "sublane":
        # pure-VPU segmented sum with tokens on the SUBLANE axis: transpose
        # once (the caller transposes the output anyway), then a
        # layout-preserving leading-dim reshape + reduce — the same pattern
        # as the kernel's per-doc blockmax. Returns (QB, DB), pre-transposed.
        wT = jnp.transpose(weighted)                      # (QBL, DB)
        return jnp.sum(wT.reshape(qb, lq_pad, db), axis=1)
    if epilogue == "reduce":
        # pure-VPU segmented sum: split the lane axis per query and reduce
        return jnp.sum(weighted.reshape(db, qb, lq_pad), axis=-1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (qbl, qb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qbl, qb), 1)
    sel = rows // lq_pad == cols
    if epilogue == "bf16":
        return jax.lax.dot_general(
            weighted.astype(jnp.bfloat16), sel.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    if epilogue == "f32d":
        # f32 inputs, DEFAULT precision: one bf16 MXU pass under
        # --xla_allow_excess_precision instead of HIGHEST's 6-pass split
        return jax.lax.dot_general(
            weighted, sel.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        weighted, sel.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _resolve_epilogue(epilogue: str, qb: int, db: int, *,
                      interpret: bool = False,
                      deferred: bool = False) -> Tuple[str, bool]:
    """Resolve 'auto' and demote illegal choices; shared by BOTH kernel
    drivers (bf16 and int8) so the gate can't diverge, and importable by
    tests to assert a given tiling actually engages a path.

    - measured (v5e): the token-major tree epilogue wins whenever the tiling
      allows it (config-5 shape: bf16 146->163, int8full 138->155 TFLOP/s);
      at small db (long docs, e.g. Lp=768 -> db=4) the (db, qb) output block
      breaks the 8-sublane tile rule and 'sublane' is both legal and already
      amortized. 'tokmajor' (in-kernel transpose, standard output layout)
      over 'tokmajor_nt': nt is ~1% faster at the kernel level but its
      driver-side XLA transpose of the full score matrix costs ~18%
      END-TO-END at 1M pages (config 5: 771 -> 631 q/s).
    - lane-slice ('tok*') epilogues need lane-tile-aligned qb; the nt layout
      additionally needs db % 8 (its (db, qb) block is the output tile).
    - the deferred grid is token-major-only and implies the nt emit layout.
    """
    if interpret and epilogue == "bf16":
        epilogue = "f32"  # CPU interpret mode lacks bf16 x bf16 dots
    if deferred:
        if qb % 128 != 0 or db % 8 != 0:
            deferred = False
        else:
            epilogue = "tokmajor_nt"  # deferred kernel's emit layout
    if epilogue == "auto":
        epilogue = ("tokmajor" if qb % 128 == 0 and db % 8 == 0
                    else "sublane")
    if epilogue.startswith("tok") and (
            qb % 128 != 0 or (_nt_layout(epilogue) and db % 8 != 0)):
        epilogue = "sublane"
    return epilogue, deferred


def _out_layout(n_qb, n_db, qb, db, epilogue):
    """(out_specs, out_shape, finalize) for the emit layout — shared by both
    kernel drivers. Standard layout stores (QB, DB) blocks; nt epilogues
    store (DB, QB) doc-major and the driver transposes in XLA. ``finalize``
    maps the blocked output to (nq_pad, nd_pad)."""
    if _nt_layout(epilogue):
        spec = pl.BlockSpec((1, 1, db, qb), lambda i, j, l: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((n_qb, n_db, db, qb), jnp.float32)
        fin = lambda out: out.transpose(0, 3, 1, 2).reshape(
            n_qb * qb, n_db * db)
    else:
        spec = pl.BlockSpec((1, 1, qb, db), lambda i, j, l: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((n_qb, n_db, qb, db), jnp.float32)
        fin = lambda out: out.transpose(0, 2, 1, 3).reshape(
            n_qb * qb, n_db * db)
    return spec, shape, fin


def _chain_sum(acc_ref, qmf_ref, db, qb, lq_pad):
    """Single-pass token-major epilogue: one sequential sweep over the acc
    scratch, fusing the doc_has_token ``where``, the qmask weight, and the
    Lq-sum per lane slice.

    The tree variants ('tokmajor*') first materialize the full (DB, QBL)
    ``where(acc)*qmask`` buffer (3 MB at r4096/c3072) and then re-stream it
    level by level — measured VMEM-bandwidth-bound (tok1 299 vs tok32
    155 TFLOP/s inside the int8 kernel). Here each lane slice is read from
    the scratch ref ONCE and the (DB, QB) accumulator stays in vector
    registers: minimum possible epilogue traffic (one acc read).
    """
    acc = acc_ref[:]    # the scratch is already VMEM-resident; one load
    qmrow = qmf_ref[0]  # (1, QBL)
    out = jnp.zeros((db, qb), jnp.float32)
    for t in range(lq_pad):
        a = acc[:, t * qb:(t + 1) * qb]
        m = jnp.where(a > NEG_THRESH, a, 0.0)
        out = out + m * qmrow[:, t * qb:(t + 1) * qb]
    return out  # (DB, QB), untransposed


def _value_chain_sum(bm, db, qb, lq_pad):
    """doc_has_token ``where`` + Lq chain-sum over lane-aligned slices.

    Used by the single-lp-tile direct path (blockmax streams straight from
    the matmul into the sum, never touching the acc scratch) AND as the
    'tokpre' epilogue (callers pass ``acc_ref[:]``): there the q-weight row
    was already applied PRE-max in the main fused stream (positive per-q-
    token weights commute with the doc-token max; zero-weight tokens give
    max 0 over valid doc tokens, and all-invalid docs stay NEG_INIT either
    way — exact), so one acc read remains, the (DB, QB) accumulator stays
    register-resident, and no row slicing happens (Mosaic rejects
    lane-slicing a (1, QBL) row: 'Invalid input layout')."""
    out = jnp.zeros((db, qb), jnp.float32)
    for t in range(lq_pad):
        a = bm[:, t * qb:(t + 1) * qb]
        out = out + jnp.where(a > NEG_THRESH, a, 0.0)
    return out  # (DB, QB), untransposed


def _fused_tree_sum(acc, qm2, db, qb, lq_pad, group):
    """'tokfuse{G}' epilogue: the doc_has_token ``where`` and the qmask mul
    are fused into the FIRST level of the token-major tree sum, so the
    full-width ``where(acc)*qmask`` buffer of 'tokmajor' (the measured
    VMEM-traffic bound: tok1 299 vs tok32 155 TFLOP/s inside the int8
    kernel) is never materialized — each acc lane slice is read exactly
    once and immediately folded into a level-0 group partial.

    acc: (DB, QBL) scratch value, token-major lanes (token t = lane columns
    [t*qb, (t+1)*qb)). qm2: (lq_pad, qb) per-q-token weight rows — the SAME
    bytes as the (1, QBL) token-major row, reshaped host-side so sublane t
    is token t's weight row (Mosaic rejects lane-slicing a (1, QBL) row).
    Level-0 chains ``group`` fused terms per partial (group=lq_pad
    degenerates to a pure chain = minimum temporaries, maximum serial
    dependence); the partials then tree-sum. Returns (QB, DB) — standard
    emit layout, transposed in-kernel like 'tokmajor'.

    Traffic model at the config-5 int8full shape ((DB, QBL) = (192, 4096)
    f32 = 3 MB): 'tokmajor' streams ~13.5 MB per emit (where+mul read 3 +
    write 3, tree read ~4 + write ~3 + output); 'tokfuse4' streams ~5.5 MB
    (acc read 3, level-0 write 0.75, tree ~1.5, output ~0.1)."""
    def term(t):
        a = acc[:, t * qb:(t + 1) * qb]
        return jnp.where(a > NEG_THRESH, a, 0.0) * qm2[t:t + 1, :]

    parts = []
    for g0 in range(0, lq_pad, group):
        s = term(g0)
        for t in range(g0 + 1, min(g0 + group, lq_pad)):
            s = s + term(t)
        parts.append(s)
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return jnp.transpose(parts[0])  # (QB, DB)


def _fuse_group(epilogue: str, lq_pad: int) -> int:
    """Level-0 chain length for a 'tokfuse{G}' epilogue name ('' -> 2)."""
    g = int(epilogue[7:]) if epilogue[7:].isdigit() else 2
    return max(1, min(g, lq_pad))


def _emit_finish(out_ref, acc_ref, qmf_ref, db, qb, lq_pad, epilogue,
                 out_dtype):
    """End-of-contraction epilogue emit, shared by EVERY kernel variant
    (bf16, int8, int4) so an epilogue fix can never diverge between them.
    Runs at the last lp-tile step with the accumulated (DB, QBL) blockmax
    in ``acc_ref``. Emit layouts: 'tok*' and 'sublane' store (DB, QB)
    doc-major-in-block (the 'tokmajor_nt' driver transposes in XLA); the
    legacy epilogues store qb-major (db is 128-aligned for long-doc tiles,
    so the (..., qb, db) output array avoids lane padding at large N)."""
    if epilogue.startswith("tokfuse"):
        out_ref[0, 0] = _fused_tree_sum(
            acc_ref[:], qmf_ref[0], db, qb, lq_pad,
            _fuse_group(epilogue, lq_pad)).astype(out_dtype)
        return
    if epilogue == "tokchain":
        out_ref[0, 0] = _chain_sum(acc_ref, qmf_ref, db, qb, lq_pad
                                   ).astype(out_dtype)
        return
    if epilogue == "tokpre":
        # q-weight row was already applied pre-max in the fused stream
        out_ref[0, 0] = _value_chain_sum(acc_ref[:], db, qb, lq_pad
                                         ).astype(out_dtype)
        return
    acc = acc_ref[:]
    # doc_has_token rule: all-invalid doc -> 0
    mx = jnp.where(acc > NEG_THRESH, acc, 0.0)
    weighted = mx * qmf_ref[0]  # (DB, QBL) * (1, QBL)
    out = _finish_sum(weighted, db, qb, lq_pad, epilogue)  # (DB, QB)
    if epilogue == "sublane" or epilogue.startswith("tok"):
        out_ref[0, 0] = out.astype(out_dtype)
    else:
        out_ref[0, 0] = jnp.transpose(out).astype(out_dtype)


def _flatten_q(Qp, qm, n_qb, qb, lq_pad, d_pad, epilogue):
    """Flatten padded queries to kernel row layout: (nq_pad*lq_pad, d_pad)
    rows + (n_qb, 1, qb*lq_pad) mask rows.

    Default: query-major within each q-block (row = q_local*lq_pad + t).
    'tokmajor': token-major (row = t*qb + q_local) so the epilogue's Lq-sum
    over lanes is lq_pad lane-aligned slice adds with no relayout.
    """
    nq_pad = n_qb * qb
    qbl = qb * lq_pad
    if epilogue.startswith("tokfuse"):
        # token-major rows; the weight rides as (n_qb, lq_pad, qb) — same
        # bytes as the flat token-major row, pre-split so the kernel can
        # SUBLANE-slice token t's weight row (lane-slicing a (1, QBL) row
        # is illegal in Mosaic)
        qf = (Qp.reshape(n_qb, qb, lq_pad, d_pad).transpose(0, 2, 1, 3)
              .reshape(nq_pad * lq_pad, d_pad))
        qmf = qm.reshape(n_qb, qb, lq_pad).transpose(0, 2, 1)
    elif epilogue.startswith("tok"):
        qf = (Qp.reshape(n_qb, qb, lq_pad, d_pad).transpose(0, 2, 1, 3)
              .reshape(nq_pad * lq_pad, d_pad))
        qmf = (qm.reshape(n_qb, qb, lq_pad).transpose(0, 2, 1)
               .reshape(n_qb, 1, qbl))
    else:
        qf = Qp.reshape(nq_pad * lq_pad, d_pad)
        qmf = qm.reshape(n_qb, 1, qbl)
    return qf, qmf


def _kernel(qf_ref, qmf_ref, p_ref, pm_ref, out_ref, acc_ref, *, db, tlp, lq_pad, qb,
            out_dtype, precision, epilogue="sublane", n_lp_static=None):
    """Transposed-similarity formulation.

    sim^T = Pblk (DB*TLP, D) @ Qblk^T -> (DB*TLP, QBL): with docs on the
    SUBLANE axis the per-doc segment max is a layout-preserving leading-dim
    reshape (DB, TLP, QBL) + a reduce over axis 1 — no per-segment slices
    (the earlier query-major form built DB lane-padded (QBL, 1) intermediates
    and blew the 16MB scoped-VMEM limit at DB=32).
    """
    l = pl.program_id(2)
    n_l = pl.num_programs(2)

    if epilogue == "tokpre" and n_lp_static == 1:
        # single-lp-tile direct path: skip the acc scratch entirely
        pblk0 = p_ref[:].reshape(db * tlp, p_ref.shape[-1])
        simT0 = jax.lax.dot_general(
            pblk0, qf_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        pmcol0 = jnp.transpose(pm_ref[0])
        simT0 = jnp.where(pmcol0 > 0.5, simT0 * qmf_ref[0], NEG_INIT)
        bm = jnp.max(simT0.reshape(db, tlp, simT0.shape[-1]), axis=1)
        out_ref[0, 0] = _value_chain_sum(bm, db, qb, lq_pad).astype(out_dtype)
        return

    @pl.when(l == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, NEG_INIT)

    # (DB, TLP, D) -> (DB*TLP, D): leading-dim merge, layout-preserving
    pblk = p_ref[:].reshape(db * tlp, p_ref.shape[-1])
    # NOTE: MXU accumulators must be 32-bit; a bf16 running max (extra cast
    # pass) was measured SLOWER than keeping everything f32 (72 vs 87 TFLOP/s)
    simT = jax.lax.dot_general(
        pblk, qf_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (DB*TLP, QBL)
    # mask rides as a (1, DB*TLP) row (a trailing unit dim would lane-pad the
    # HBM array 128x — fatal at 1M docs) and is transposed to a column here
    pmcol = jnp.transpose(pm_ref[0])  # (DB*TLP, 1)
    if epilogue == "tokpre":
        # q-weight row applied pre-max (commutes; see _pre_chain_sum)
        simT = jnp.where(pmcol > 0.5, simT * qmf_ref[0], NEG_INIT)
    else:
        simT = jnp.where(pmcol > 0.5, simT, NEG_INIT)

    # segmented running max: docs live on the sublane axis
    blockmax = jnp.max(simT.reshape(db, tlp, simT.shape[-1]), axis=1)  # (DB, QBL)
    acc_ref[:] = jnp.maximum(acc_ref[:], blockmax)

    @pl.when(l == n_l - 1)
    def _finish():
        _emit_finish(out_ref, acc_ref, qmf_ref, db, qb, lq_pad, epilogue,
                     out_dtype)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "max_tlp")
)
def _maxsim_pallas_fwd(Q, P, qmask, pmask, compute_dtype=jnp.bfloat16,
                       interpret: bool = False, target_rows: int = None,
                       target_cols: int = 3072, epilogue: str = "auto",
                       max_tlp: int = None):
    # target_rows=None = _auto_rows (one q-block covers the batch, cap 8192):
    # bf16 168.7 vs 163.2 TFLOP/s at the 4096 default (bf16_sweep_smalllp).
    # History: 4096 beat 2048 with the sublane epilogue at both the headline
    # shape (31.0k vs 30.3k q/s, Lp=768) and the config-5 probe shape (+6%,
    # Lp=16); 2048 was the f32-epilogue tune.
    nq, lq, d = Q.shape
    nd, lp, _ = P.shape
    if target_rows is None:
        target_rows = _auto_rows(nq, lq)
    qb, lq_pad, db, tlp = _pick_tiles(lq, lp, target_rows, target_cols, nq=nq,
                                      max_tlp=max_tlp)
    epilogue, _ = _resolve_epilogue(epilogue, qb, db, interpret=interpret)

    nq_pad = _round_up(max(nq, qb), qb)
    nd_pad = _round_up(max(nd, db), db)
    lp_pad = _round_up(lp, tlp)
    d_pad = _round_up(d, 128)

    def padded(x, shape, dtype):
        # zero-copy when the array already conforms (large serving indexes
        # are pre-padded by build_sharded_index; a 4GB transient would hurt)
        x = x.astype(dtype)
        if x.shape == shape:
            return x
        return jnp.zeros(shape, dtype).at[tuple(slice(0, s) for s in x.shape)].set(x)

    Qp = padded(Q, (nq_pad, lq_pad, d_pad), compute_dtype)
    Pp = padded(P, (nd_pad, lp_pad, d_pad), compute_dtype)
    qm = padded(qmask, (nq_pad, lq_pad), jnp.float32)
    pm = padded(pmask, (nd_pad, lp_pad), jnp.float32)

    qbl = qb * lq_pad
    n_qb = nq_pad // qb
    n_db = nd_pad // db
    n_lp = lp_pad // tlp

    # query(-token) rows + mask row per q-block ((n_qb, 1, QBL), broadcast
    # over doc sublanes); 'tokmajor' lays each q-block out token-major
    qf, qmf = _flatten_q(Qp, qm, n_qb, qb, lq_pad, d_pad, epilogue)

    # pre-tile the doc mask into the kernel's (doc_block, lp_tile) layout:
    # slot j*n_lp + l = docs [j*db, (j+1)*db) x tokens [l*tlp, (l+1)*tlp),
    # doc-major, stored as rows (kernel transposes to a sublane column)
    pm_t = (
        pm.reshape(n_db, db, n_lp, tlp)
        .transpose(0, 2, 1, 3)
        .reshape(n_db * n_lp, 1, db * tlp)
    )

    # fp32 compute asks the MXU for full-precision passes; bf16 runs one pass
    fp32 = compute_dtype == jnp.float32
    precision = jax.lax.Precision.HIGHEST if fp32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(
        _kernel, db=db, tlp=tlp, lq_pad=lq_pad, qb=qb, out_dtype=jnp.float32,
        precision=precision, epilogue=epilogue, n_lp_static=n_lp,
    )

    flops = 2 * (nq_pad * lq_pad) * (nd_pad * lp_pad) * d_pad
    out_spec, out_shape, finalize = _out_layout(n_qb, n_db, qb, db, epilogue)
    out = pl.pallas_call(
        kernel,
        grid=(n_qb, n_db, n_lp),
        in_specs=[
            pl.BlockSpec((qbl, d_pad), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM),
            # qmf: (1, 1, qbl) row, or (1, lq_pad, qb) for 'tokfuse*'
            pl.BlockSpec((1,) + qmf.shape[1:], lambda i, j, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db, tlp, d_pad), lambda i, j, l: (j, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, db * tlp),
                         lambda i, j, l: (j * pl.num_programs(2) + l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (q_block, doc_block)-major output layout so the (QB, DB) block fills
        # its last two array dims exactly (TPU block-shape constraint);
        # 'tokmajor_nt' stores (DB, QB) blocks and transposes in XLA below
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((db, qbl), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=qf.size * qf.dtype.itemsize
            + Pp.size * Pp.dtype.itemsize * n_qb
            + nq_pad * nd_pad * 4,
            transcendentals=0,
        ),
        # q-blocks are independent; doc/patch dims carry the running-max
        # accumulator and must stay sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qf, qmf, Pp, pm_t)
    return finalize(out)[:nq, :nd]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def maxsim_pallas(Q, P, qmask, pmask, compute_dtype=jnp.bfloat16,
                  interpret: bool = False):
    """Fused MaxSim on TPU. Returns (nq, nd) float32 scores.

    Differentiable w.r.t. Q and P (backward via the XLA oracle's VJP — the
    max-gradient scatters to argmax tokens, matching torch ``max(dim)`` grads).
    """
    return _maxsim_pallas_fwd(Q, P, qmask, pmask, compute_dtype=compute_dtype,
                              interpret=interpret)


# fused Pallas backward (recompute + indicator matmuls); set False to fall
# back to differentiating the chunked XLA oracle instead
FUSED_BACKWARD = True


def _fwd(Q, P, qmask, pmask, compute_dtype, interpret):
    if FUSED_BACKWARD:
        from evdr_tpu.ops.pallas_maxsim_bwd import maxsim_pallas_fwd_train

        out, M = maxsim_pallas_fwd_train(Q, P, qmask, pmask,
                                         compute_dtype=compute_dtype,
                                         interpret=interpret)
        return out, (Q, P, qmask, pmask, M)
    out = _maxsim_pallas_fwd(Q, P, qmask, pmask, compute_dtype=compute_dtype,
                             interpret=interpret)
    return out, (Q, P, qmask, pmask, None)


def _bwd(compute_dtype, interpret, res, g):
    Q, P, qmask, pmask, M = res
    if FUSED_BACKWARD and M is not None:
        from evdr_tpu.ops.pallas_maxsim_bwd import maxsim_pallas_bwd

        dq, dp = maxsim_pallas_bwd(Q, P, qmask, pmask, M, g,
                                   compute_dtype=compute_dtype,
                                   interpret=interpret)
        return dq.astype(Q.dtype), dp.astype(P.dtype), None, None
    _, vjp = jax.vjp(lambda q, p: _maxsim_xla(q, p, qmask, pmask), Q, P)
    dq, dp = vjp(g.astype(jnp.float32))
    return dq, dp, None, None


maxsim_pallas.defvjp(_fwd, _bwd)


def maxsim_pallas_interpret(Q, P, qmask, pmask):
    """Interpreter-mode wrapper (CPU tests)."""
    return maxsim_pallas(Q, P, qmask, pmask, jnp.float32, True)


# ---------------------------------------------------------------------------
# int8-quantized index variant (serving): P stored as int8 codes + per-token
# f32 scales (ops/quantize.py). Halves the dominant HBM stream vs bf16. The
# scale rides the same pre-tiled row layout as the mask, with -1 marking
# invalid tokens (a 0 scale is a VALID all-zero token and must score 0, not
# be masked) — one `where` applies dequantization AND masking.
# ---------------------------------------------------------------------------

def _int8_simT(qf_ref, p_ref, sc_ref, db, tlp, compute_dtype, precision,
               qrow=None):
    """Masked, dequantized similarity block sim^T (DB*TLP, QBL)."""
    if qf_ref.dtype == jnp.int8:
        # full-int8 path: int8 x int8 -> int32 runs the MXU at 2x bf16 peak
        # (measured 182 vs 123 TFLOP/s on the config-2 workload); the q-side
        # scales are folded into the qmf row applied after the max
        pblk = p_ref[:].reshape(db * tlp, p_ref.shape[-1])
        simT = jax.lax.dot_general(
            pblk, qf_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # (DB*TLP, QBL)
    else:
        # int8 -> compute dtype convert is D-wide VPU work amortized over all
        # QBL output columns of the matmul
        pblk = p_ref[:].reshape(db * tlp, p_ref.shape[-1]).astype(compute_dtype)
        simT = jax.lax.dot_general(
            pblk, qf_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (DB*TLP, QBL)
    scol = jnp.transpose(sc_ref[0])  # (DB*TLP, 1): scale, or -1 if invalid
    if qrow is not None:  # 'tokpre': q-weight row pre-max (commutes)
        return jnp.where(scol >= 0, simT * scol * qrow, NEG_INIT)
    return jnp.where(scol >= 0, simT * scol, NEG_INIT)


def _kernel_int8(qf_ref, qmf_ref, p_ref, sc_ref, out_ref, acc_ref, *, db, tlp,
                 lq_pad, qb, out_dtype, precision, compute_dtype,
                 epilogue="sublane", n_lp_static=None):
    l = pl.program_id(2)
    n_l = pl.num_programs(2)

    if epilogue == "tokpre" and n_lp_static == 1:
        # single-lp-tile direct path (the small-Lp serving shape): no acc
        # scratch round-trip at all — blockmax flows from the fused
        # matmul/max stream straight into the chain sum
        simT = _int8_simT(qf_ref, p_ref, sc_ref, db, tlp, compute_dtype,
                          precision, qrow=qmf_ref[0])
        blockmax = jnp.max(simT.reshape(db, tlp, simT.shape[-1]), axis=1)
        out_ref[0, 0] = _value_chain_sum(blockmax, db, qb, lq_pad
                                         ).astype(out_dtype)
        return

    @pl.when(l == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, NEG_INIT)

    simT = _int8_simT(qf_ref, p_ref, sc_ref, db, tlp, compute_dtype, precision,
                      qrow=qmf_ref[0] if epilogue == "tokpre" else None)
    blockmax = jnp.max(simT.reshape(db, tlp, simT.shape[-1]), axis=1)
    acc_ref[:] = jnp.maximum(acc_ref[:], blockmax)

    @pl.when(l == n_l - 1)
    def _finish():
        _emit_finish(out_ref, acc_ref, qmf_ref, db, qb, lq_pad, epilogue,
                     out_dtype)


def _int8full_auto_max_tlp(nq, lq, lp, target_rows, target_cols):
    """Long-doc auto policy (int8 dot only — measured): splitting Lp so db
    becomes a multiple of 8 unlocks the token-major epilogue. v5e at Lp=768
    (256q x 32t): tlp=384/db=8 tokmajor 169.9 vs tlp=768/db=4 sublane ~153
    TFLOP/s (tpuq tlp384_i8f, 8/19). The bf16 dot LOSES from the same split
    (127 vs 146) and the int8-INDEX (bf16-dot) kernel too (124.5, tpuq
    tlp384_i8x) — policy is deliberately scoped to the int8full driver.

    Gated on LOW PADDING WASTE: _maxsim_int8_impl pads lp up to a multiple
    of tlp, so forcing tlp=384 at e.g. Lp=512 would pad to 768 (1.5x MXU
    work) — the split only engages when the 384-padded lp stays within
    ~10% of the natural padding (Lp=768 -> 768/768, exactly the probed
    win; Lp=512 or 400 -> skip)."""
    qb_n, _, db_n, tlp_n = _pick_tiles(lq, lp, target_rows, target_cols,
                                       nq=nq)
    if (tlp_n > 384 and db_n % 8 != 0 and qb_n % 128 == 0
            and (target_cols // 384) % 8 == 0
            and _round_up(lp, 384) * 10 <= 11 * _round_up(lp, tlp_n)):
        return 384
    return None


def _kernel_int8_defer(qf_ref, qmf_ref, p_ref, sc_ref, out_ref, acc_ref,
                       done_ref, *, db, tlp, lq_pad, qb, out_dtype, precision,
                       compute_dtype, n_db):
    """Deferred-epilogue variant: doc-block j's Lq-sum epilogue is emitted at
    the FIRST step of doc-block j+1 (grid carries one extra doc column).

    Rationale: in `_kernel_int8` the epilogue depends on the same step's
    matmul (matmul -> max -> epilogue is a serial chain), and at small Lp
    (one contraction step) the measured epilogue cost is ~12x its cost in
    the bf16 kernel — it does not overlap the int8 MXU stream. Emitting the
    PREVIOUS block's epilogue makes it independent of the in-flight matmul,
    giving Mosaic a legal MXU/VPU overlap.
    """
    j = pl.program_id(1)
    l = pl.program_id(2)
    n_l = pl.num_programs(2)

    @pl.when((l == 0) & (j > 0))
    def _emit():  # epilogue of doc-block j-1, from the saved accumulator
        acc = done_ref[:]
        mx = jnp.where(acc > NEG_THRESH, acc, 0.0)
        weighted = mx * qmf_ref[0]
        # token-major tree sum (see _finish_sum 'tokmajor_nt'): no relayout
        out_ref[0, 0] = _finish_sum(weighted, db, qb, lq_pad,
                                    "tokmajor_nt").astype(out_dtype)

    @pl.when(j < n_db)
    def _compute():
        @pl.when(l == 0)
        def _init():
            acc_ref[:] = jnp.full_like(acc_ref, NEG_INIT)

        simT = _int8_simT(qf_ref, p_ref, sc_ref, db, tlp, compute_dtype,
                          precision)
        blockmax = jnp.max(simT.reshape(db, tlp, simT.shape[-1]), axis=1)
        mx = jnp.maximum(acc_ref[:], blockmax)
        acc_ref[:] = mx

        @pl.when(l == n_l - 1)
        def _save():
            done_ref[:] = mx


@functools.partial(
    jax.jit, static_argnames=("interpret", "target_rows", "target_cols",
                              "epilogue", "deferred", "max_tlp")
)
def maxsim_pallas_int8full(Q, P_i8, scales, qmask, pmask,
                           interpret: bool = False, target_rows: int = None,
                           target_cols: int = 3072, epilogue: str = "auto",
                           deferred: bool = False, max_tlp: int = None):
    """Fully-quantized MaxSim: int8 queries x int8 index on the MXU.

    Queries are quantized per token ON DEVICE (symmetric, like
    ops/quantize.py); the q-side scale rides the post-max qmask row, the
    p-side scale the pre-max column — both mathematically exact, so scores
    equal the dequantized-fp32 oracle up to the two int8 roundings.
    ~1.5x the bf16 kernel's throughput (int8 MXU runs at 2x peak).

    target_rows=None = _auto_rows (one q-block covers the batch, cap 8192):
    170.1 TFLOP/s vs 154.0 at the old 4096 default at the config-5 serving
    shape (i8f_sweep_smalllp.out).
    """
    if target_rows is None:
        target_rows = _auto_rows(Q.shape[0], qmask.shape[-1])
    amax = jnp.max(jnp.abs(Q).astype(jnp.float32), axis=-1)   # (nq, lq)
    sq = amax / 127.0
    safe = jnp.where(sq > 0, sq, 1.0)
    Q_i8 = jnp.clip(jnp.round(Q.astype(jnp.float32) / safe[..., None]),
                    -127, 127).astype(jnp.int8)
    q_weight = qmask.astype(jnp.float32) * sq
    if max_tlp is None and epilogue == "auto":
        max_tlp = _int8full_auto_max_tlp(Q.shape[0], qmask.shape[-1],
                                         pmask.shape[-1], target_rows,
                                         target_cols)
    return _maxsim_int8_impl(Q_i8, q_weight, P_i8, scales, pmask,
                             compute_dtype=jnp.int8, interpret=interpret,
                             target_rows=target_rows, target_cols=target_cols,
                             epilogue=epilogue, deferred=deferred,
                             max_tlp=max_tlp)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "deferred",
                              "max_tlp")
)
def maxsim_pallas_int8(Q, P_i8, scales, qmask, pmask,
                       compute_dtype=jnp.bfloat16, interpret: bool = False,
                       target_rows: int = None, target_cols: int = 3072,
                       epilogue: str = "auto", deferred: bool = False,
                       max_tlp: int = None):
    # target_rows=None = _auto_rows: 170.6 TFLOP/s at rows=8192 vs 161.4 at
    # the old 4096 default (i8x_sweep_smalllp.out, config-5 serving shape).
    # History: r4096 > r2048 with the sublane epilogue (30.6k vs 29.5k q/s
    # at Lp=768; 32.3k vs 30.2k at Lp=16, 256q x 32t, bf16 dot).
    """Fused MaxSim over an int8-quantized index.

    Q (nq, Lq, D) float; P_i8 (nd, Lp, D) int8 codes; scales (nd, Lp) f32
    per-token scales (ops/quantize.py). Scores match the dequantized-fp32
    oracle up to compute-dtype rounding.
    """
    if target_rows is None:
        target_rows = _auto_rows(Q.shape[0], qmask.shape[-1])
    return _maxsim_int8_impl(Q, qmask.astype(jnp.float32), P_i8, scales,
                             pmask, compute_dtype=compute_dtype,
                             interpret=interpret, target_rows=target_rows,
                             target_cols=target_cols, epilogue=epilogue,
                             deferred=deferred, max_tlp=max_tlp)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "deferred",
                              "max_tlp")
)
def _maxsim_int8_impl(Q, q_weight, P_i8, scales, pmask,
                      compute_dtype=jnp.bfloat16, interpret: bool = False,
                      target_rows: int = 1024, target_cols: int = 2048,
                      epilogue: str = "auto", deferred: bool = False,
                      max_tlp: int = None):
    """Shared int8-index kernel driver; Q float (bf16 dot) or int8 (int8 dot);
    ``q_weight`` is the post-max per-query-token row (mask, optionally * sq)."""
    nq, lq, d = Q.shape
    nd, lp, _ = P_i8.shape
    qb, lq_pad, db, tlp = _pick_tiles(lq, lp, target_rows, target_cols, nq=nq,
                                      max_tlp=max_tlp)
    epilogue, deferred = _resolve_epilogue(epilogue, qb, db,
                                           interpret=interpret,
                                           deferred=deferred)

    nq_pad = _round_up(max(nq, qb), qb)
    nd_pad = _round_up(max(nd, db), db)
    lp_pad = _round_up(lp, tlp)
    d_pad = _round_up(d, 128)

    def padded(x, shape, dtype, fill=0):
        x = x.astype(dtype)
        if x.shape == shape:
            return x
        return jnp.full(shape, fill, dtype).at[
            tuple(slice(0, s) for s in x.shape)].set(x)

    Qp = padded(Q, (nq_pad, lq_pad, d_pad), compute_dtype)
    Pp = padded(P_i8, (nd_pad, lp_pad, d_pad), jnp.int8)
    qm = padded(q_weight, (nq_pad, lq_pad), jnp.float32)
    # sentinel layout: valid token -> its scale (>= 0), invalid/pad -> -1
    sct = jnp.where(pmask, scales.astype(jnp.float32), -1.0)
    sct = padded(sct, (nd_pad, lp_pad), jnp.float32, fill=-1.0)

    qbl = qb * lq_pad
    n_qb, n_db, n_lp = nq_pad // qb, nd_pad // db, lp_pad // tlp
    qf, qmf = _flatten_q(Qp, qm, n_qb, qb, lq_pad, d_pad, epilogue)
    sc_t = (sct.reshape(n_db, db, n_lp, tlp).transpose(0, 2, 1, 3)
            .reshape(n_db * n_lp, 1, db * tlp))

    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    cost = pl.CostEstimate(
        flops=2 * (nq_pad * lq_pad) * (nd_pad * lp_pad) * d_pad,
        bytes_accessed=qf.size * qf.dtype.itemsize
        + Pp.size * 1 * n_qb + nq_pad * nd_pad * 4,
        transcendentals=0,
    )
    if deferred:
        # one extra doc column; p/scale maps clamp so the duplicate prefetch
        # is a single doc block per q-block (~1/n_db extra traffic)
        kernel = functools.partial(
            _kernel_int8_defer, db=db, tlp=tlp, lq_pad=lq_pad, qb=qb,
            out_dtype=jnp.float32, precision=precision,
            compute_dtype=compute_dtype, n_db=n_db)
        jmax = n_db - 1
        out = pl.pallas_call(
            kernel,
            grid=(n_qb, n_db + 1, n_lp),
            in_specs=[
                pl.BlockSpec((qbl, d_pad), lambda i, j, l: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, qbl), lambda i, j, l: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((db, tlp, d_pad),
                             lambda i, j, l: (jnp.minimum(j, jmax), l, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, db * tlp),
                    lambda i, j, l: (
                        jnp.minimum(j, jmax) * pl.num_programs(2) + l, 0, 0),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, db, qb),
                lambda i, j, l: (i, jnp.maximum(j - 1, 0), 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_qb, n_db, db, qb), jnp.float32),
            scratch_shapes=[pltpu.VMEM((db, qbl), jnp.float32),
                            pltpu.VMEM((db, qbl), jnp.float32)],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(qf, qmf, Pp, sc_t)
        scores = out.transpose(0, 3, 1, 2).reshape(nq_pad, nd_pad)
        return scores[:nq, :nd]

    kernel = functools.partial(
        _kernel_int8, db=db, tlp=tlp, lq_pad=lq_pad, qb=qb,
        out_dtype=jnp.float32, precision=precision, compute_dtype=compute_dtype,
        epilogue=epilogue, n_lp_static=n_lp)

    out_spec, out_shape, finalize = _out_layout(n_qb, n_db, qb, db, epilogue)
    out = pl.pallas_call(
        kernel,
        grid=(n_qb, n_db, n_lp),
        in_specs=[
            pl.BlockSpec((qbl, d_pad), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            # qmf: (1, 1, qbl) row, or (1, lq_pad, qb) for 'tokfuse*'
            pl.BlockSpec((1,) + qmf.shape[1:], lambda i, j, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db, tlp, d_pad), lambda i, j, l: (j, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, db * tlp),
                         lambda i, j, l: (j * pl.num_programs(2) + l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((db, qbl), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qf, qmf, Pp, sc_t)
    return finalize(out)[:nq, :nd]


# ---------------------------------------------------------------------------
# product-quantized index variant (serving): P stored as (nd, Lp, M) uint8
# nearest-centroid codes + (M, K<=256, ·) codebooks (ops/pq.py) — M bytes per
# token, 8x below int8 at M=16. The XLA LUT-gather path (ops/pq.py:
# maxsim_pq_xla) measured 17.4 q/s on chip vs 2,561 for the fused bf16 tier
# at the identical 250k-doc shape (bench_artifacts/tpuq/bench_pq2.out) — a
# TPU has no fast gather, so the kernel DECODES each doc tile in VMEM
# instead and feeds the same dot/blockmax/epilogue machinery as every other
# tier:
#
#   decoded (rows, D) = sum_m  onehot(codes_m) (rows, K) @ books[m] (K, D)
#
# - the one-hot matmul IS the gather, phrased for the MXU; with full-width
#   (M, K, D) books the per-subspace products SUM (ops/pq.expand_books), so
#   an OPQ rotation rides inside the books and the kernel never knows.
#   Compact (M, K, D/M) books are embedded block-diagonally host-side
#   (concat-decode == sum-decode of the embedding).
# - decode FLOPs = rows*M*K*D per (doc-tile, q-block) vs rows*D*QBL for the
#   scoring dot: M*K/QBL extra work (1x at M=16, K=256, QBL=4096). Books
#   are therefore int8-quantized by default (one global scale, folded into
#   the post-max q-weight row exactly like the int8 kernel's q-scale): the
#   0/1 one-hot rides the int8 MXU path at 2x bf16 peak, halving the
#   decode overhead. The scoring dot stays compute_dtype (bf16).
# - codes ride as (n_db*n_lp, M, db*tlp) uint8 subspace-plane tiles: lanes
#   carry the big rows axis unpadded; the per-m row extraction is the same
#   sublane-slice pattern as the int4 kernel's scale sentinels. (The u8
#   sublane tile is 32, so M=16 planes cost 2x in the tiled HBM array —
#   still 4x below int8; the npz/engine STORAGE stays tight (nd, Lp, M).)
# - doc-token validity rides the bf16 kernel's (1, db*tlp) mask row; masked
#   and padded tokens carry code 0 and are NEG_INIT-filled after the dot.
# ---------------------------------------------------------------------------

_PQ_KMAX = 256  # uint8 code => at most 256 centroids per subspace

# Empirical scoped-VMEM law for the PQ kernel, measured on chip: the
# decode transients (per-subspace one-hot iota/one-hot/partial planes plus
# the streamed sim chunks) cost ~7.8 KB per doc-token COLUMN at the
# standard geometry (K=256 centroids, D=128 lanes) and are INDEPENDENT of
# the q-block size. Three OOM probes at cols=db*tlp=3072 allocated 23.3M
# (qbl=1024, verify_r5b.out), 23.8M (qbl=2048, bench_pq3.out) and 23.6M
# (qbl=4096, pqk_headline.out attempt 1) — all over the 16M scoped limit
# and all within 2% of each other, falsifying any rows*qbl model —
# while cols=1536 compiles and runs at qbl=4096 (pqk_headline attempt 2:
# 66.8 TFLOP/s). 1536 cols ≈ 12M estimated: comfortable headroom.
_PQ_COLS_MAX = 1536


def _clamp_pq_tiles(db: int, tlp: int, k_pad: int,
                    d_pad: int) -> Tuple[int, int]:
    """Cap cols=db*tlp so the PQ kernel's decode transients fit scoped VMEM.

    The budget was measured at (K=256, D=128); wider token dims scale the
    per-column decode planes, so the cap shrinks proportionally with d_pad
    (k_pad can only be <= 256 — uint8 codes). Shrinks tlp first (multiples
    of 16; more lp grid steps, same epilogue cadence per doc block), then
    db (multiple of 8 when possible so the token-major epilogue stays
    legal)."""
    cols_max = max(16, _PQ_COLS_MAX * 128 // max(128, d_pad))
    if db * tlp <= cols_max:
        return db, tlp
    tlp_new = max(16, min(tlp, cols_max // max(1, db)) // 16 * 16)
    db_new = db
    if db_new * tlp_new > cols_max:
        db_new = max(1, cols_max // tlp_new)
        if db_new >= 8:
            db_new -= db_new % 8
    return db_new, tlp_new


def _pq_auto_rows(nq: int, lq: int, lp: int) -> int:
    """Auto target_rows for the PQ kernel: cover the WHOLE query batch in
    ONE q-block.

    The decode is query-independent but re-runs per q-block — n_qb=2
    decodes the entire index twice. Measured with a 256q x 32t batch:
    rows=8192 (n_qb=1) vs the old 4096 default (n_qb=2) is 115.3 vs 78.5
    TFLOP/s at Lp=16 (pq_sweep_full_smalllp.out), 106.3 vs 76.1 for the
    index variant, and 114.6 vs 77.4 at Lp=768 (pq_sweep_full_longdoc.out)
    — the rows trend is monotone at every swept Lp precisely because each
    step halves the decode count. QBL=8192 at cols<=1536 is the largest
    measured-legal scope (both Lp regimes)."""
    del lp  # rows-monotone at every swept Lp; kept for call-site clarity
    return _auto_rows(nq, lq)


def quantize_books_int8(books) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization of (expanded) codebooks with ONE global
    scale: (M, K, D) float -> ((M, K, D) int8, scalar f32 scale). A single
    scale keeps the kernel's decoded tile a plain int32 sum (per-subspace
    scales would not commute with the sum-decode); centroid entries share
    one dynamic range in practice, and the serving-quality sweep measures
    the end effect (scripts/index_quality.py)."""
    books = jnp.asarray(books, jnp.float32)
    s = jnp.max(jnp.abs(books)) / 127.0
    safe = jnp.where(s > 0, s, 1.0)
    return (jnp.clip(jnp.round(books / safe), -127, 127).astype(jnp.int8),
            safe.astype(jnp.float32))


def _pq_decode_tile(codes_ref, books_ref, rows, m_sub, k_pad, dec_dtype,
                    precision):
    """Decode one (M, rows) code tile to (rows, d_pad) tokens in VMEM.

    int8 books: one-hot int8 x int8 book dot -> exact int32 sum (the global
    scale is folded into the caller's q-weight row). Float books: one-hot in
    the books' dtype (0/1 exact in bf16) -> f32-accumulated sum.
    ``dec_dtype=int8`` is exact ONLY for compact-embedded int8 books (one
    contribution per lane, |value| <= 127) — the driver gates it."""
    int8_books = books_ref.dtype == jnp.int8
    dec = None
    for m in range(m_sub):
        # (1, rows) plane -> (rows, 1) column; cast BEFORE the transpose so
        # the relayout runs on i32 tiles (same pattern as the int4 kernel's
        # f32 scale-sentinel planes)
        col = jnp.transpose(codes_ref[0, m:m + 1, :].astype(jnp.int32))
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, k_pad), 1)
        if int8_books:
            oh = (iota == col).astype(jnp.int8)
            part = jax.lax.dot_general(
                oh, books_ref[m],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            oh = (iota == col).astype(books_ref.dtype)
            part = jax.lax.dot_general(
                oh, books_ref[m],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
        dec = part if dec is None else dec + part
    return dec.astype(dec_dtype)


def _kernel_pq(qf_ref, qmf_ref, codes_ref, pm_ref, books_ref, out_ref,
               acc_ref, *, db, tlp, lq_pad, qb, m_sub, k_pad, out_dtype,
               precision, compute_dtype, score_int8, epilogue="sublane",
               n_lp_static=None):
    """Same skeleton as the bf16 `_kernel`, with the P tile decoded from PQ
    codes in VMEM first. Decode is query-independent; it reruns per q-block
    (n_qb is 1 at serving batch sizes — see the module-top analysis)."""
    l = pl.program_id(2)
    n_l = pl.num_programs(2)
    rows = db * tlp

    dec = _pq_decode_tile(codes_ref, books_ref, rows, m_sub, k_pad,
                          jnp.int8 if score_int8 else compute_dtype,
                          precision)
    if score_int8:
        # full-quantized scoring: int8 queries x int8 decoded tokens
        simT = jax.lax.dot_general(
            dec, qf_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        # int8-rounded queries under OPQ books cast up: a mixed int8 x bf16
        # dot is not an MXU mode, and quantized-query values (<= 127
        # integers) are exact in bf16
        qblk = (qf_ref[:].astype(compute_dtype)
                if qf_ref.dtype == jnp.int8 else qf_ref[:])
        simT = jax.lax.dot_general(
            dec, qblk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                       # (rows, QBL)
    pmcol = jnp.transpose(pm_ref[0])                   # (rows, 1)
    if epilogue == "tokpre":
        simT = jnp.where(pmcol > 0.5, simT * qmf_ref[0], NEG_INIT)
    else:
        simT = jnp.where(pmcol > 0.5, simT, NEG_INIT)
    bm = jnp.max(simT.reshape(db, tlp, simT.shape[-1]), axis=1)  # (DB, QBL)

    if epilogue == "tokpre" and n_lp_static == 1:
        out_ref[0, 0] = _value_chain_sum(bm, db, qb, lq_pad).astype(out_dtype)
        return

    @pl.when(l == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, NEG_INIT)

    acc_ref[:] = jnp.maximum(acc_ref[:], bm)

    @pl.when(l == n_l - 1)
    def _finish():
        _emit_finish(out_ref, acc_ref, qmf_ref, db, qb, lq_pad, epilogue,
                     out_dtype)


def _embed_books_full(books, d: int):
    """Books to kernel form: full-width (M, K, D) where per-subspace vectors
    SUM to the reconstruction. Expanded OPQ books pass through; compact
    (M, K, D/M) books embed block-diagonally (concat == sum of the
    embedding). Pure jnp on (M, 256, D) — negligible next to the index."""
    books = jnp.asarray(books, jnp.float32)
    m, k, w = books.shape
    if m > 1 and w == d:                     # already expanded (ops/pq.py)
        return books
    if m * w != d:
        raise ValueError(f"books {books.shape} do not match token dim {d}")
    full = jnp.zeros((m, k, d), jnp.float32)
    return full.at[
        jnp.arange(m)[:, None, None],
        jnp.arange(k)[None, :, None],
        (jnp.arange(m) * w)[:, None, None] + jnp.arange(w)[None, None, :],
    ].set(books)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "book_quant"))
def maxsim_pallas_pq(Q, codes, qmask, pmask, books,
                     compute_dtype=jnp.bfloat16, interpret: bool = False,
                     target_rows: int = None, target_cols: int = 3072,
                     epilogue: str = "auto", book_quant: bool = True):
    """Fused MaxSim over a product-quantized index (decode-in-VMEM).

    Q (nq, Lq, D) float; codes (nd, Lp, M) uint8; books compact (M, K, D/M)
    or expanded OPQ (M, K, D) float. Scores match the reconstruction oracle
    ``maxsim(Q, decode_pq(codes, books))`` up to compute-dtype rounding
    (plus the int8 book rounding when ``book_quant``, the default — see
    :func:`quantize_books_int8`)."""
    q_weight = qmask.astype(jnp.float32)
    return _maxsim_pq_impl(Q, q_weight, codes, pmask, books,
                           compute_dtype=compute_dtype, interpret=interpret,
                           target_rows=target_rows, target_cols=target_cols,
                           epilogue=epilogue, book_quant=book_quant)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "book_quant"))
def maxsim_pallas_pqfull(Q, codes, qmask, pmask, books,
                         compute_dtype=jnp.bfloat16, interpret: bool = False,
                         target_rows: int = None, target_cols: int = 3072,
                         epilogue: str = "auto", book_quant: bool = True):
    """PQ serving with int8-quantized queries (the pallas_q8 tier). Query
    quantization and q-side scale placement match maxsim_pallas_int8full.
    With compact plain-PQ books (+ book_quant) the decoded tile is exactly
    int8 (block-diagonal embedding: one contribution per lane, <= 127) and
    the scoring dot runs int8 x int8 at 2x MXU peak; OPQ expanded books
    overlap lanes (a sum-decode can exceed int8), so there the quantized
    queries cast up and score in compute_dtype."""
    amax = jnp.max(jnp.abs(Q).astype(jnp.float32), axis=-1)
    sq = amax / 127.0
    safe = jnp.where(sq > 0, sq, 1.0)
    Q_i8 = jnp.clip(jnp.round(Q.astype(jnp.float32) / safe[..., None]),
                    -127, 127).astype(jnp.int8)
    q_weight = qmask.astype(jnp.float32) * sq
    return _maxsim_pq_impl(Q_i8, q_weight, codes, pmask, books,
                           compute_dtype=compute_dtype, interpret=interpret,
                           target_rows=target_rows, target_cols=target_cols,
                           epilogue=epilogue, book_quant=book_quant)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "book_quant"))
def _maxsim_pq_impl(Q, q_weight, codes, pmask, books,
                    compute_dtype=jnp.bfloat16, interpret: bool = False,
                    target_rows: int = None, target_cols: int = 3072,
                    epilogue: str = "auto", book_quant: bool = True):
    """Shared PQ kernel driver; Q float (compute_dtype dot) or int8.
    ``target_rows=None`` = the measured auto policy (_pq_auto_rows)."""
    nq, lq, d = Q.shape
    nd, lp, m_sub = codes.shape
    if target_rows is None:
        target_rows = _pq_auto_rows(nq, lq, lp)
    qb, lq_pad, db, tlp = _pick_tiles(lq, lp, target_rows, target_cols,
                                      nq=nq)
    tlp = max(16, tlp)
    d_pad = _round_up(d, 128)
    db, tlp = _clamp_pq_tiles(db, tlp, _round_up(books.shape[1], 128), d_pad)
    epilogue, _ = _resolve_epilogue(epilogue, qb, db, interpret=interpret)

    nq_pad = _round_up(max(nq, qb), qb)
    nd_pad = _round_up(max(nd, db), db)
    lp_pad = _round_up(lp, tlp)

    def padded(x, shape, dtype, fill=0):
        x = x.astype(dtype)
        if x.shape == shape:
            return x
        return jnp.full(shape, fill, dtype).at[
            tuple(slice(0, s) for s in x.shape)].set(x)

    compact = not (books.shape[0] > 1 and books.shape[-1] == d)
    books_full = _embed_books_full(books, d)           # (M, K, D) f32
    k_pad = _round_up(books_full.shape[1], 128)
    if books_full.shape[1] > _PQ_KMAX:
        raise ValueError(f"uint8 codes support K <= {_PQ_KMAX} centroids; "
                         f"got K={books_full.shape[1]}")
    if book_quant:
        books_q, s_books = quantize_books_int8(books_full)
        books_k = padded(books_q, (m_sub, k_pad, d_pad), jnp.int8)
        q_weight = q_weight * s_books                 # post-max, commutes
    else:
        books_k = padded(books_full, (m_sub, k_pad, d_pad),
                         jnp.float32 if compute_dtype == jnp.float32
                         else compute_dtype)
    # int8 x int8 scoring (2x MXU peak) needs an exactly-int8 decoded tile:
    # only compact-embedded int8 books guarantee one contribution per lane
    score_int8 = bool(Q.dtype == jnp.int8 and book_quant and compact)

    qdt = Q.dtype if Q.dtype == jnp.int8 else compute_dtype
    Qp = padded(Q, (nq_pad, lq_pad, d_pad), qdt)
    qm = padded(q_weight, (nq_pad, lq_pad), jnp.float32)
    pm = padded(pmask.astype(jnp.float32), (nd_pad, lp_pad), jnp.float32)
    codes_p = padded(codes, (nd_pad, lp_pad, m_sub), jnp.uint8)

    qbl = qb * lq_pad
    n_qb, n_db, n_lp = nq_pad // qb, nd_pad // db, lp_pad // tlp
    qf, qmf = _flatten_q(Qp, qm, n_qb, qb, lq_pad, d_pad, epilogue)

    # subspace-plane code tiles: (n_db*n_lp, M, db*tlp), rows on lanes
    ct = (codes_p.reshape(n_db, db, n_lp, tlp, m_sub)
          .transpose(0, 2, 4, 1, 3).reshape(n_db * n_lp, m_sub, db * tlp))
    pm_t = (pm.reshape(n_db, db, n_lp, tlp).transpose(0, 2, 1, 3)
            .reshape(n_db * n_lp, 1, db * tlp))

    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    # decode adds rows*M*K*D FLOPs per (doc-tile, q-block)
    flops = (2 * (nq_pad * lq_pad) * (nd_pad * lp_pad) * d_pad
             + 2 * n_qb * (nd_pad * lp_pad) * m_sub * k_pad * d_pad)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=qf.size * qf.dtype.itemsize
        + ct.size * 1 * n_qb + nq_pad * nd_pad * 4,
        transcendentals=0,
    )
    kernel = functools.partial(
        _kernel_pq, db=db, tlp=tlp, lq_pad=lq_pad, qb=qb, m_sub=m_sub,
        k_pad=k_pad, out_dtype=jnp.float32, precision=precision,
        compute_dtype=compute_dtype, score_int8=score_int8,
        epilogue=epilogue, n_lp_static=n_lp)

    out_spec, out_shape, finalize = _out_layout(n_qb, n_db, qb, db, epilogue)
    out = pl.pallas_call(
        kernel,
        grid=(n_qb, n_db, n_lp),
        in_specs=[
            pl.BlockSpec((qbl, d_pad), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + qmf.shape[1:], lambda i, j, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_sub, db * tlp),
                         lambda i, j, l: (j * pl.num_programs(2) + l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, db * tlp),
                         lambda i, j, l: (j * pl.num_programs(2) + l, 0, 0),
                         memory_space=pltpu.VMEM),
            # books replicate: same block every step, stays VMEM-resident
            pl.BlockSpec((m_sub, k_pad, d_pad), lambda i, j, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((db, qbl), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qf, qmf, ct, pm_t, books_k)
    return finalize(out)[:nq, :nd]


# ---------------------------------------------------------------------------
# packed-int4 index variant (serving): P stored as TOKEN-PAIR packed uint8
# (two Lp-tokens per byte, full-width D lanes — ops/int4.py) + per-token f32
# scales. Halves the dominant HBM stream vs int8. The layout is chosen so
# the unpack needs NO lane-axis work: the byte tile splits into an even-
# token and an odd-token int8 plane, each runs the same full-K dot as the
# int8 kernel at half the rows, and MaxSim's max-over-tokens absorbs the
# interleave (max(bm_even, bm_odd) — token order never matters under max).
# The two scale sentinels ride as separate planes of one prefetched row.
# ---------------------------------------------------------------------------

# measured-good maximum for one (db*tlp_half, QBL) f32 sim plane at SMALL lp
# tiles: rows=4096/cols=1536 at qbl=4096 => db=96, 96*8*4096 elems = 12.6 MB
# (chip: 121.5 full / 134.3 index TFLOP/s — the wave-2 sweep bests), while
# the cols=3072 default's 25.2 MB plane scope-OOMs remote compile (HTTP 500,
# bench_artifacts/tpuq/int4_*_smalllp_sweep.out).
_INT4_PLANE_BUDGET_ELEMS = 96 * 8 * 4096


def _clamp_int4_db(db: int, tlp_half: int, qbl: int) -> int:
    """VMEM legality clamp for the int4 kernel's doc-block size.

    At tiny lp tiles Mosaic materializes a full (db*tlp_half, QBL) f32 sim
    plane per nibble — the segmented max over tlp_half sublane groups
    cannot stream it — so library-default tiles exceed the 16 MB scoped-
    VMEM budget and the TPU compile fails. Long-doc tiles stream fine
    (tlp_half=384 ran a would-be 25 MB plane at 161.7 TFLOP/s) and are
    left alone. Clamped db keeps a multiple of 8 when possible so the
    token-major epilogue stays legal."""
    if tlp_half >= 128:
        return db
    db_max = max(1, _INT4_PLANE_BUDGET_ELEMS // max(1, tlp_half * qbl))
    if db_max >= 8:
        db_max -= db_max % 8
    return min(db, db_max)


def _int4_blockmax(qf_ref, p_ref, sc_ref, db, tlp_half, compute_dtype,
                   precision, qrow=None):
    """Masked, dequantized per-doc blockmax (DB, QBL) from one packed tile."""
    d = p_ref.shape[-1]
    praw = p_ref[:].reshape(db * tlp_half, d).astype(jnp.int32)
    lo = praw & 15
    lo = lo - 16 * (lo >= 8).astype(jnp.int32)     # even tokens, sign-extended
    hi = praw >> 4
    hi = hi - 16 * (hi >= 8).astype(jnp.int32)     # odd tokens

    def simT(codes):
        if qf_ref.dtype == jnp.int8:
            # full-quantized path: int8 x int8 -> int32 on the MXU (codes
            # are ±7 — comfortably inside int8)
            return jax.lax.dot_general(
                codes.astype(jnp.int8), qf_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        return jax.lax.dot_general(
            codes.astype(compute_dtype), qf_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                    # (DB*TLP/2, QBL)

    def masked(sim, plane):
        scol = jnp.transpose(sc_ref[0, plane:plane + 1])  # (DB*TLP/2, 1)
        val = sim * scol if qrow is None else sim * scol * qrow
        return jnp.where(scol >= 0, val, NEG_INIT)

    bm_even = jnp.max(masked(simT(lo), 0).reshape(db, tlp_half, -1), axis=1)
    bm_odd = jnp.max(masked(simT(hi), 1).reshape(db, tlp_half, -1), axis=1)
    return jnp.maximum(bm_even, bm_odd)             # (DB, QBL)


def _kernel_int4(qf_ref, qmf_ref, p_ref, sc_ref, out_ref, acc_ref, *, db,
                 tlp_half, lq_pad, qb, out_dtype, precision, compute_dtype,
                 epilogue="sublane", n_lp_static=None):
    l = pl.program_id(2)
    n_l = pl.num_programs(2)

    if epilogue == "tokpre" and n_lp_static == 1:
        # single-lp-tile direct path (the small-Lp serving shape)
        bm = _int4_blockmax(qf_ref, p_ref, sc_ref, db, tlp_half,
                            compute_dtype, precision, qrow=qmf_ref[0])
        out_ref[0, 0] = _value_chain_sum(bm, db, qb, lq_pad).astype(out_dtype)
        return

    @pl.when(l == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, NEG_INIT)

    bm = _int4_blockmax(qf_ref, p_ref, sc_ref, db, tlp_half, compute_dtype,
                        precision,
                        qrow=qmf_ref[0] if epilogue == "tokpre" else None)
    acc_ref[:] = jnp.maximum(acc_ref[:], bm)

    @pl.when(l == n_l - 1)
    def _finish():
        _emit_finish(out_ref, acc_ref, qmf_ref, db, qb, lq_pad, epilogue,
                     out_dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "target_rows", "target_cols",
                              "epilogue", "max_tlp")
)
def maxsim_pallas_int4full(Q, P_u8, scales, qmask, pmask,
                           interpret: bool = False, target_rows: int = None,
                           target_cols: int = 3072, epilogue: str = "auto",
                           max_tlp: int = None):
    """Fully-quantized MaxSim over a packed-int4 index: int8 queries x int4
    codes on the MXU (int8 dot). Query quantization and the q-side scale
    placement match maxsim_pallas_int8full exactly.

    target_rows=None = _auto_rows (one q-block covers the batch, cap 8192):
    at qbl=8192 the _clamp_int4_db VMEM clamp halves db to 48 yet n_qb=1
    still wins — the index-variant sweep measured 137.7 TFLOP/s at
    rows=8192 vs 134.2 at the 4096 default (i4x_sweep_smalllp.out)."""
    if target_rows is None:
        target_rows = _auto_rows(Q.shape[0], qmask.shape[-1])
    amax = jnp.max(jnp.abs(Q).astype(jnp.float32), axis=-1)
    sq = amax / 127.0
    safe = jnp.where(sq > 0, sq, 1.0)
    Q_i8 = jnp.clip(jnp.round(Q.astype(jnp.float32) / safe[..., None]),
                    -127, 127).astype(jnp.int8)
    q_weight = qmask.astype(jnp.float32) * sq
    return _maxsim_int4_impl(Q_i8, q_weight, P_u8, scales, pmask,
                             compute_dtype=jnp.int8, interpret=interpret,
                             target_rows=target_rows, target_cols=target_cols,
                             epilogue=epilogue, max_tlp=max_tlp)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "max_tlp")
)
def maxsim_pallas_int4(Q, P_u8, scales, qmask, pmask,
                       compute_dtype=jnp.bfloat16, interpret: bool = False,
                       target_rows: int = None, target_cols: int = 3072,
                       epilogue: str = "auto", max_tlp: int = None):
    """Fused MaxSim over a token-pair-packed int4 index (ops/int4.py).

    Q (nq, Lq, D) float; P_u8 (nd, ceil(Lp/2), D) uint8 packed codes;
    scales (nd, Lp) f32 per-token scales. Scores match the dequantized-fp32
    oracle up to compute-dtype rounding. target_rows=None = _auto_rows
    (137.7 vs 134.2 TFLOP/s at the serving shape, i4x_sweep_smalllp.out)."""
    if target_rows is None:
        target_rows = _auto_rows(Q.shape[0], qmask.shape[-1])
    return _maxsim_int4_impl(Q, qmask.astype(jnp.float32), P_u8, scales,
                             pmask, compute_dtype=compute_dtype,
                             interpret=interpret, target_rows=target_rows,
                             target_cols=target_cols, epilogue=epilogue,
                             max_tlp=max_tlp)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "target_rows",
                              "target_cols", "epilogue", "max_tlp")
)
def _maxsim_int4_impl(Q, q_weight, P_u8, scales, pmask,
                      compute_dtype=jnp.bfloat16, interpret: bool = False,
                      target_rows: int = 4096, target_cols: int = 3072,
                      epilogue: str = "auto", max_tlp: int = None):
    """Shared packed-int4 kernel driver; Q float (bf16 dot) or int8
    (int8 dot); ``q_weight`` is the post-max per-query-token row."""
    nq, lq, d = Q.shape
    nd = P_u8.shape[0]
    lp = pmask.shape[-1]
    qb, lq_pad, db, tlp = _pick_tiles(lq, lp, target_rows, target_cols,
                                      nq=nq, max_tlp=max_tlp)
    tlp = max(16, tlp)          # multiples of 16 -> always even
    tlp_half = tlp // 2
    db = _clamp_int4_db(db, tlp_half, qb * lq_pad)
    epilogue, _ = _resolve_epilogue(epilogue, qb, db, interpret=interpret)

    nq_pad = _round_up(max(nq, qb), qb)
    nd_pad = _round_up(max(nd, db), db)
    lp_pad = _round_up(lp, tlp)
    d_pad = _round_up(d, 128)

    def padded(x, shape, dtype, fill=0):
        x = x.astype(dtype)
        if x.shape == shape:
            return x
        return jnp.full(shape, fill, dtype).at[
            tuple(slice(0, s) for s in x.shape)].set(x)

    Qp = padded(Q, (nq_pad, lq_pad, d_pad), compute_dtype)
    Pp = padded(P_u8, (nd_pad, lp_pad // 2, d_pad), jnp.uint8)
    qm = padded(q_weight, (nq_pad, lq_pad), jnp.float32)
    # sentinel layout: valid token -> its scale (>= 0), invalid/pad -> -1;
    # the packed token axis splits the sentinel row into even/odd planes
    sct = jnp.where(pmask, scales.astype(jnp.float32), -1.0)
    sct = padded(sct, (nd_pad, lp_pad), jnp.float32, fill=-1.0)

    qbl = qb * lq_pad
    n_qb, n_db, n_lp = nq_pad // qb, nd_pad // db, lp_pad // tlp
    qf, qmf = _flatten_q(Qp, qm, n_qb, qb, lq_pad, d_pad, epilogue)

    def plane(sc2):  # (nd_pad, lp_pad/2) -> (n_db*n_lp, db*tlp_half)
        return (sc2.reshape(n_db, db, n_lp, tlp_half).transpose(0, 2, 1, 3)
                .reshape(n_db * n_lp, db * tlp_half))

    sc_t = jnp.stack([plane(sct[:, 0::2]), plane(sct[:, 1::2])], axis=1)

    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    cost = pl.CostEstimate(
        flops=2 * (nq_pad * lq_pad) * (nd_pad * lp_pad) * d_pad,
        bytes_accessed=qf.size * qf.dtype.itemsize
        + Pp.size * 1 * n_qb + nq_pad * nd_pad * 4,
        transcendentals=0,
    )
    kernel = functools.partial(
        _kernel_int4, db=db, tlp_half=tlp_half, lq_pad=lq_pad, qb=qb,
        out_dtype=jnp.float32, precision=precision,
        compute_dtype=compute_dtype, epilogue=epilogue, n_lp_static=n_lp)

    out_spec, out_shape, finalize = _out_layout(n_qb, n_db, qb, db, epilogue)
    out = pl.pallas_call(
        kernel,
        grid=(n_qb, n_db, n_lp),
        in_specs=[
            pl.BlockSpec((qbl, d_pad), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            # qmf: (1, 1, qbl) row, or (1, lq_pad, qb) for 'tokfuse*'
            pl.BlockSpec((1,) + qmf.shape[1:], lambda i, j, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db, tlp_half, d_pad), lambda i, j, l: (j, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, db * tlp_half),
                         lambda i, j, l: (j * pl.num_programs(2) + l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((db, qbl), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qf, qmf, Pp, sc_t)
    return finalize(out)[:nq, :nd]
