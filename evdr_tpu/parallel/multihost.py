"""Multi-host deployment: one JAX process per host, doc shards per process.

The in-process mesh layer (``parallel/mesh.py`` + ``sharded_index.py``)
covers the chips one process can address. TPU pods and multi-slice
deployments run ONE process PER HOST, so serving a corpus bigger than a
host's HBM needs two extra pieces, and only these two — the shard_map
programs in ``parallel/topk.py`` / ``parallel/train_sharded.py`` are
expressed over a global mesh and lower their collectives to cross-host
transports unchanged (ICI within a slice, DCN across slices; Gloo on the
CPU rig the tests use):

1. :func:`init_multihost` — wire this process into the global runtime
   (``jax.distributed``). After it, ``jax.devices()`` is the GLOBAL device
   list while ``jax.local_devices()`` is this host's slice.
2. :func:`build_multihost_index` — assemble the global doc-sharded index
   where each host materializes ONLY the rows its local devices own. Pair
   it with an ``np.memmap``-backed packed file on shared storage
   (``tools/convert_packed.py``, ``load_packed_payload(mmap_docs=True)``):
   rows owned by other hosts are never paged in, so per-host IO and RSS
   stay at one host's shard slice regardless of corpus size.

The reference has no distributed layer at all (SURVEY.md §2.4 — one Python
process, one GPU, ``mainv1.py:168-170``); this module is the cross-host
half of the design BASELINE.json's 1M-page north star asks for.

Validated without pod hardware by ``tests/test_multihost.py``: two OS
processes x two virtual CPU devices each form a 4-device global mesh whose
collectives cross real process boundaries (Gloo), and the sharded scores /
top-k / int8 paths reproduce the process-local oracle.
"""

from __future__ import annotations

import functools
import sys
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evdr_tpu.parallel.mesh import DOC_AXIS, DP_AXIS
from evdr_tpu.parallel.sharded_index import ShardedIndex


@functools.lru_cache(maxsize=32)
def _reshard_prog(sharding: NamedSharding):
    """ONE jitted reshard program per target sharding (a fresh jit lambda
    per call would retrace AND recompile every invocation — 40s-3min each
    over a remote-TPU tunnel, paid while serving holds its dispatch lock)."""
    return jax.jit(lambda a: a, out_shardings=sharding)


def to_replicated(x, mesh: Mesh):
    """Reshard a global array to fully-replicated (a collective — every
    process must call it; typically only process 0 consumes the copy)."""
    if hasattr(x, "sharding") and not x.sharding.is_fully_replicated:
        return _reshard_prog(NamedSharding(mesh, P()))(x)
    return x


def gather_to_host(x, mesh: Mesh, chunk_bytes: int = 1 << 28) -> np.ndarray:
    """Host numpy copy of a global array with BOUNDED device memory.

    ``to_replicated`` of a whole doc-sharded array puts the full array on
    every device — impossible at exactly the beyond-one-host scale this
    layer exists for. Instead, reshard and fetch dim-0 row chunks (device
    working set = one ~``chunk_bytes`` chunk per device) and concatenate on
    the host. A collective: every process must run it with the same args.
    """
    if not hasattr(x, "sharding"):
        return np.asarray(x)
    if x.sharding.is_fully_replicated or x.ndim == 0:
        return np.asarray(x)
    row_bytes = max(1, int(np.prod(x.shape[1:])) * x.dtype.itemsize)
    rows = max(1, min(int(x.shape[0]), chunk_bytes // row_bytes))
    parts = []
    for lo in range(0, int(x.shape[0]), rows):
        parts.append(np.asarray(to_replicated(x[lo:lo + rows], mesh)))
    return np.concatenate(parts, axis=0)


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Wire this process into the global JAX runtime.

    On TPU pods every argument auto-detects from the TPU metadata
    (``jax.distributed.initialize()`` bare); on CPU/GPU rigs pass
    ``coordinator_address`` ("host:port", process 0's address),
    ``num_processes`` and ``process_id`` explicitly. Must run before the
    first ``jax.devices()`` call of the process — backend wiring is
    immutable once initialized.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)


def global_doc_mesh(axis: str = DOC_AXIS) -> Mesh:
    """1D mesh over ALL global devices (every process constructs the same)."""
    return Mesh(np.array(jax.devices()), (axis,))


def global_doc_mesh_2d(dp: int, docs: int) -> Mesh:
    """Global dp x docs mesh (see mesh.make_mesh_2d for the layout intent)."""
    devs = jax.devices()
    if dp * docs != len(devs):
        raise ValueError(f"dp*docs = {dp * docs} must equal the global "
                         f"device count {len(devs)}")
    return Mesh(np.array(devs).reshape(dp, docs), (DP_AXIS, DOC_AXIS))


def replicate_global(x, mesh: Mesh):
    """Fully-replicated global array from identical per-process host data.

    (``jax.device_put`` covers the single-process case;
    ``make_array_from_process_local_data`` is the multi-process-correct way
    to feed every device the same host array, e.g. the query batch.)
    """
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), x, x.shape)


def _assemble_rows(slicer, shardings, gshapes, n_valid: int):
    """Assemble dim-0-sharded global arrays from per-device row slices.

    ``slicer(lo, hi)`` returns one host array per output (rows [lo:hi),
    ``hi`` already clipped to ``n_valid``); rows past ``n_valid`` become
    zero padding. Only ADDRESSABLE shards are read — slicing an
    ``np.memmap`` pages in just the touched rows, so this is the
    bounded-RSS contract of sharded_index._shard_docs_streamed keyed off
    the sharding's own index map, which is correct whatever rows THIS
    process's devices own (device order on pods follows the physical
    torus, not process rank).
    """
    pieces = [[] for _ in gshapes]
    # every output shares dim-0 row ranges: use the first sharding's map
    for dev, idx in shardings[0].addressable_devices_indices_map(
            gshapes[0]).items():
        rows = idx[0]
        lo = 0 if rows.start is None else int(rows.start)
        hi = gshapes[0][0] if rows.stop is None else int(rows.stop)
        outs = slicer(lo, min(hi, n_valid))
        for slot, o in zip(pieces, outs):
            if o.shape[0] < hi - lo:  # rows past n_valid: zero padding
                o = np.pad(o, ((0, hi - lo - o.shape[0]),)
                           + ((0, 0),) * (o.ndim - 1))
            slot.append(jax.device_put(o, dev))
    mk = jax.make_array_from_single_device_arrays
    return [mk(gs, sh, ps) for gs, sh, ps in zip(gshapes, shardings, pieces)]


class MultihostSearchCoordinator:
    """SPMD search coordination for one-process-per-host serving.

    Every program over a global mesh must be entered by ALL processes with
    identical input shapes, so an online server cannot dispatch a search
    from process 0 alone. This coordinator makes process 0 the frontend:
    each search first broadcasts a fixed-shape int32 header (opcode, batch,
    Lq, D, k, n_candidates), then the query tensors; follower processes sit
    in :meth:`follow`, mirror the broadcasts, and enter the identical
    search program. Query shapes should snap to buckets on the frontend
    (``tools/serve_http.py`` does) so follower compile caches stay small.

    Duck-types the engine surface ``make_server`` consumes, so it drops in
    as the server's engine. The frontend must serialize searches — in
    evdr-serve that invariant is carried by the MicroBatcher's SINGLE
    dispatcher thread (tools/serve_http.py); direct callers must not
    invoke ``search_dense`` concurrently — two interleaved broadcast
    streams would desynchronize the followers.
    """

    OP_STOP, OP_SEARCH = 0, 1
    # incremental-update mutations broadcast through the same fixed-shape
    # header channel; engine.add/delete/compact/to_packed_payload are
    # collectives (deterministic host bookkeeping + per-host shard
    # assembly), so mirroring the inputs is all the followers need
    OP_ADD, OP_DELETE, OP_COMPACT, OP_SNAPSHOT = 2, 3, 4, 5

    def __init__(self, engine):
        self.engine = engine

    # --- engine surface (frontend) --------------------------------------
    @property
    def n_docs(self):
        return self.engine.n_docs

    @property
    def dim(self):
        return self.engine.dim

    @property
    def dtype(self):
        return self.engine.dtype

    @property
    def impl(self):
        return self.engine.impl

    @property
    def summary(self):
        return self.engine.summary

    @property
    def index(self):
        return self.engine.index

    def ids_for(self, idx):
        return self.engine.ids_for(idx)

    @staticmethod
    def _bcast(arr):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.broadcast_one_to_all(arr))

    def search_dense(self, Q, qmask, k: int = 10, n_candidates=None):
        """Process-0 search: announce, ship queries, run the SPMD program.

        Validation happens BEFORE the broadcasts: once the header is out,
        every follower enters the same search, so an error the frontend
        would catch per-request must not be one the followers die on.
        """
        if n_candidates and self.engine.summary is None:
            raise ValueError(
                "n_candidates requires a pruning summary index (construct "
                "the engine with prune_centroids>0)")
        Q = np.asarray(Q, dtype=np.float32)
        qmask = np.asarray(qmask, dtype=bool)
        self._bcast(np.asarray([self.OP_SEARCH, Q.shape[0], Q.shape[1],
                                Q.shape[2], int(k), int(n_candidates or 0)],
                               dtype=np.int32))
        self._bcast(Q)
        self._bcast(qmask)
        return self.engine.search_dense(Q, qmask, k=k,
                                        n_candidates=n_candidates)

    # --- incremental mutations (frontend) --------------------------------
    # docid lists ride as one JSON-encoded uint8 blob (arbitrary id strings;
    # the header carries its byte length so followers size the buffer)

    @staticmethod
    def _ids_blob(ids) -> np.ndarray:
        import json

        return np.frombuffer(
            json.dumps([str(d) for d in ids]).encode("utf-8"), dtype=np.uint8)

    @staticmethod
    def _ids_unblob(blob: np.ndarray) -> list:
        import json

        return json.loads(bytes(bytearray(blob)).decode("utf-8"))

    def add(self, P_new, pmask_new, docids=None, normalize=None) -> int:
        """Broadcast-then-apply document addition: every process appends
        the identical rows to its host tail buffers; the device tail
        assembles per-host rows on the next (SPMD) search."""
        P_new = np.asarray(P_new, dtype=np.float32)
        pm_new = np.asarray(pmask_new, dtype=bool)
        # validate BEFORE the first broadcast: a deterministic shape error
        # must raise on the frontend only (HTTP 400), never reach the
        # followers — their mutation path is fail-stop (see follow())
        if P_new.ndim != 3 or P_new.shape[-1] != self.engine.dim:
            raise ValueError(
                f"add() embeddings must be (n, Lp, {self.engine.dim}); "
                f"got {P_new.shape}")
        if pm_new.shape != P_new.shape[:2]:
            raise ValueError(
                f"pmask shape {pm_new.shape} does not match docs "
                f"{P_new.shape[:2]}")
        blob = (self._ids_blob(docids) if docids is not None
                else np.zeros(0, np.uint8))
        norm_code = -1 if normalize is None else int(bool(normalize))
        self._bcast(np.asarray(
            [self.OP_ADD, P_new.shape[0], P_new.shape[1], P_new.shape[2],
             int(blob.size), norm_code], dtype=np.int32))
        self._bcast(P_new)
        self._bcast(pm_new)
        if blob.size:
            self._bcast(blob)
        return self.engine.add(
            P_new, pm_new, docids=docids,
            normalize=None if norm_code < 0 else bool(norm_code))

    def add_ragged(self, documents_obj, doc_attnmask=None, doc_imgmask=None,
                   docids=None) -> int:
        from evdr_tpu.data.packing import preprocess_docs

        P, pmask, _ = preprocess_docs(documents_obj, doc_attnmask,
                                      doc_imgmask)
        return self.add(P, pmask, docids=docids)

    def delete(self, docids) -> int:
        blob = self._ids_blob(docids)
        self._bcast(np.asarray([self.OP_DELETE, int(blob.size), 0, 0, 0, 0],
                               dtype=np.int32))
        if blob.size:
            self._bcast(blob)
        return self.engine.delete([str(d) for d in docids])

    def compact(self):
        self._bcast(np.asarray([self.OP_COMPACT, 0, 0, 0, 0, 0],
                               dtype=np.int32))
        self.engine.compact()
        return self

    def to_packed_payload(self) -> dict:
        """Collective row materialization; only the frontend's payload is
        consumed (evdr-serve's /save writes it outside the dispatch lock)."""
        self._bcast(np.asarray([self.OP_SNAPSHOT, 0, 0, 0, 0, 0],
                               dtype=np.int32))
        return self.engine.to_packed_payload()

    @staticmethod
    def write_packed_npz(path, payload: dict) -> None:
        from evdr_tpu.engine import RetrievalEngine

        RetrievalEngine.write_packed_npz(path, payload)

    def save_npz(self, path) -> None:
        self.write_packed_npz(path, self.to_packed_payload())

    def follow(self) -> None:
        """Follower loop (processes > 0): mirror searches until OP_STOP.

        READ ops (search, snapshot): a per-request failure is logged and
        the loop continues — the frontend's HTTP handler catches the same
        exception and answers the client; a follower that died on it would
        leave the next broadcast blocking forever on a missing peer (the
        whole deployment bricked by one bad request). Deterministic desync
        is not a risk: both sides run the same program on the same inputs,
        so they fail (or not) together.

        MUTATING ops (add, delete, compact) are FAIL-STOP: deterministic
        validation errors are raised on the frontend BEFORE the broadcast
        (see :meth:`add`), so an exception here is a host-LOCAL anomaly
        (allocation failure, disk error). Swallowing it would leave this
        process's engine state diverged from the frontend's, and the next
        SPMD search would then enter collectives with mismatched global
        shapes — a cluster-wide hang far from the cause. Crashing here
        stops the deployment AT the cause with the error on stderr.
        """
        mutating = (self.OP_ADD, self.OP_DELETE, self.OP_COMPACT)
        while True:
            hdr = self._bcast(np.zeros(6, dtype=np.int32))
            op, b, lq, d, k, nc = (int(x) for x in hdr)
            if op == self.OP_STOP:
                return
            try:
                if op == self.OP_SEARCH:
                    Q = self._bcast(np.zeros((b, lq, d), dtype=np.float32))
                    qm = self._bcast(np.zeros((b, lq), dtype=bool))
                    self.engine.search_dense(Q, qm, k=k,
                                             n_candidates=nc or None)
                elif op == self.OP_ADD:
                    # header: (op, n, lp, d, ids_blob_bytes, norm_code)
                    P = self._bcast(np.zeros((b, lq, d), dtype=np.float32))
                    pm = self._bcast(np.zeros((b, lq), dtype=bool))
                    ids = (self._ids_unblob(
                        self._bcast(np.zeros(k, np.uint8))) if k else None)
                    self.engine.add(P, pm, docids=ids,
                                    normalize=None if nc < 0 else bool(nc))
                elif op == self.OP_DELETE:
                    ids = (self._ids_unblob(
                        self._bcast(np.zeros(b, np.uint8))) if b else [])
                    self.engine.delete(ids)
                elif op == self.OP_COMPACT:
                    self.engine.compact()
                elif op == self.OP_SNAPSHOT:
                    self.engine.to_packed_payload()  # collective gathers
                else:
                    raise RuntimeError(f"unknown multihost opcode {op}")
            except Exception as e:
                if op in mutating:  # host-local anomaly -> fail-stop
                    print(f"[multihost follower] MUTATION op {op} failed; "
                          f"state would diverge — stopping: "
                          f"{type(e).__name__}: {e}",
                          file=sys.stderr, flush=True)
                    raise
                # read op: mirror of the HTTP handler's catch-all
                print(f"[multihost follower] op {op} failed (frontend "
                      f"answers the client): {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)

    def stop(self) -> None:
        """Process 0: release the followers (e.g. at server shutdown)."""
        self._bcast(np.zeros(6, dtype=np.int32))


def shard_docs_global(x, mesh: Mesh, n_pad: Optional[int] = None):
    """Dim-0 (doc-axis) sharded GLOBAL array from per-process local rows.

    The multi-process counterpart of ``mesh.shard_docs`` — used for arrays
    that live alongside the index (the student param, its mask, sharded
    teacher-score tables): every process passes the same full-corpus host
    view ``x`` (mmap ok) and device_puts only its locally-owned rows.
    ``n_pad`` (default: dim 0 rounded up to the doc-shard count) zero-pads
    exactly like ``build_sharded_index``.
    """
    n = int(x.shape[0])
    n_shards = dict(mesh.shape).get(DOC_AXIS, mesh.devices.size)
    if n_pad is None:
        n_pad = ((n + n_shards - 1) // n_shards) * n_shards
    sh = NamedSharding(mesh, P(DOC_AXIS, *([None] * (x.ndim - 1))))
    gshape = (n_pad,) + tuple(int(s) for s in x.shape[1:])
    [arr] = _assemble_rows(lambda lo, hi: [np.asarray(x[lo:hi])],
                           [sh], [gshape], n)
    return arr


def build_multihost_index(P_full, pmask, mesh: Mesh, docids=None,
                          dtype: Optional[str] = None, pad_docs_to: int = 1,
                          scales=None) -> ShardedIndex:
    """Global doc-sharded index; each host touches ONLY its own rows.

    Every process calls this with the SAME (mmap-able) full-corpus view and
    the same arguments; each slices out just the row ranges its local
    devices own (lazy reads — combine with ``load_packed_payload(...,
    mmap_docs=True)`` so remote rows are never paged in), transforms them
    shard-locally (``dtype`` cast; int8 per-token quantization is
    doc-independent, hence shard-local == global bit-for-bit), and the
    pieces assemble into one global array. Semantics (doc padding, n_docs,
    int8 scales; pass pre-quantized codes + ``scales`` for --normalize
    packed files) match ``build_sharded_index`` exactly, so the resulting
    :class:`ShardedIndex` drives sharded_maxsim / sharded_topk / the
    sharded train step unchanged.
    """
    n = int(P_full.shape[0])
    # token width comes from pmask, NOT P_full: pre-packed int4 codes store
    # ceil(Lp/2) token-pair rows while pmask/scales keep the full Lp
    lp = int(pmask.shape[1])
    lp_codes = int(P_full.shape[1])
    n_shards = dict(mesh.shape).get(DOC_AXIS, mesh.devices.size)
    quantum = n_shards * max(1, int(pad_docs_to))
    n_pad = ((n + quantum - 1) // quantum) * quantum
    tail = tuple(int(s) for s in P_full.shape[2:])

    np_cast = None
    if dtype is not None and dtype not in ("int8", "int4"):
        import ml_dtypes

        np_cast = (np.dtype(dtype) if dtype != "bfloat16"
                   else np.dtype(ml_dtypes.bfloat16))

    if dtype == "int4" and scales is None:
        # per-slice token-pair packing halves the token axis of the CODES
        # produced below (ops/int4.py); scales/pmask keep the full Lp
        from evdr_tpu.ops.int4 import packed_token_rows

        lp_codes = packed_token_rows(lp)

    sh3 = NamedSharding(mesh, P(DOC_AXIS, *([None] * (1 + len(tail)))))
    sh2 = NamedSharding(mesh, P(DOC_AXIS, None))
    g3 = (n_pad, lp_codes) + tail
    g2 = (n_pad, lp)

    if dtype in ("int8", "int4") and scales is None:
        if dtype == "int8":
            from evdr_tpu.ops.quantize import quantize_tokens_int8 as _quant
        else:
            from evdr_tpu.ops.int4 import quantize_tokens_int4 as _quant

        def slice_quant(lo, hi):
            sl = np.asarray(P_full[lo:hi])
            ms = np.asarray(pmask[lo:hi], dtype=bool)
            codes, sc = _quant(sl, ms)
            return codes, sc, ms

        codes_arr, scales_arr, pm_arr = _assemble_rows(
            slice_quant, [sh3, sh2, sh2], [g3, g2, g2], n)
        return ShardedIndex(P=codes_arr, pmask=pm_arr, n_docs=n,
                            docids=docids, mesh=mesh, scales=scales_arr)

    def slice_cast(lo, hi):
        sl = np.asarray(P_full[lo:hi])
        if np_cast is not None and sl.dtype != np_cast:
            sl = sl.astype(np_cast)
        outs = [sl, np.asarray(pmask[lo:hi], dtype=bool)]
        if scales is not None:  # pre-quantized packed file (--normalize)
            outs.append(np.asarray(scales[lo:hi]))
        return outs

    shardings = [sh3, sh2] + ([sh2] if scales is not None else [])
    gshapes = [g3, g2] + ([g2] if scales is not None else [])
    arrs = _assemble_rows(slice_cast, shardings, gshapes, n)
    return ShardedIndex(P=arrs[0], pmask=arrs[1], n_docs=n, docids=docids,
                        mesh=mesh,
                        scales=(arrs[2] if scales is not None else None))
