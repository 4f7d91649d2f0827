"""RetrievalEngine — the user-facing TPU-native multi-vector retrieval API.

Loads (or receives) a page-embedding index, shards it over the device mesh,
and serves MaxSim top-k queries with the fused kernel + device-side candidate
merge. This is the serving counterpart of the training harness: a reference
user's end state ("score my queries against this index") in three lines:

    engine = RetrievalEngine.from_npz("features/tabfquad_dump_all.npz")
    docids, scores = engine.search(query_token_arrays, k=10)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from evdr_tpu.data.npz_io import load_payload
from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
from evdr_tpu.parallel.mesh import make_mesh, replicate
from evdr_tpu.parallel.sharded_index import ShardedIndex, build_sharded_index
from evdr_tpu.parallel.topk import sharded_maxsim, sharded_topk


class RetrievalEngine:
    def __init__(self, mesh=None, dtype: str = "bfloat16", chunk_p: int = 512,
                 impl: str = "auto", normalize: bool = True,
                 prune_centroids: int = 0, quantize_queries: bool = False,
                 pq_m: int = 16, pq_opq: bool = False,
                 summary_dtype: Optional[str] = None):
        """``prune_centroids > 0`` additionally builds a per-page centroid
        summary index enabling two-stage pruned search (PLAID-style):
        ``search_dense(..., n_candidates=C)`` scores the cheap summary index
        first and exactly reranks only C candidate pages per query.

        ``dtype='int8'`` stores the index quantized (ops/quantize.py, half the
        HBM of bf16); adding ``quantize_queries=True`` also quantizes queries
        on device so scoring runs int8 x int8 on the MXU (~1.3x bf16 kernel
        throughput, measured 1.000 top-1 agreement vs fp32).

        ``dtype='int4'`` packs two 4-bit codes per byte + per-token scales
        (ops/int4.py) — half of int8's HBM, the capacity rung between int8
        and PQ; scored by chunked unpack-and-matmul.

        ``dtype='pq'`` product-quantizes the index (ops/pq.py): ``pq_m``
        bytes per token — 8x smaller than int8 at D=128, M=16 — scored via
        per-query lookup tables (asymmetric distance; lossy). Composes with
        ``prune_centroids`` when built from float embeddings (the PLAID
        combination: float summaries prune, PQ candidates rerank).
        ``pq_opq=True`` additionally learns an OPQ rotation at build time
        (ops/pq.train_opq) — lower quantization error at the SAME index
        bytes; the rotation is folded into expanded codebooks once, so the
        serving path is unchanged.

        ``summary_dtype`` overrides the storage tier of the pruning summary
        index (stage 1). Default: the engine dtype for float/int8/int4
        engines, bfloat16 for PQ engines. For PQ+pruned capacity builds the
        bf16 summaries DOMINATE total bytes (kc x 256 B/page vs pq_m x Lp
        B/page of codes); ``summary_dtype='int8'`` (or 'int4') halves
        (quarters) that — stage 1 then scores through the quantized kernels
        (pruned_topk_fused's ``sscales`` path), stage 2 reranks exactly as
        before. 'pq' summaries are not supported (stage 1 has no books)."""
        if summary_dtype not in (None, "bfloat16", "float32", "int8", "int4"):
            raise ValueError(
                f"summary_dtype={summary_dtype!r} unsupported: the summary "
                "stage scores dense tokens (bfloat16/float32/int8/int4)")
        self.summary_dtype = summary_dtype
        self.mesh = mesh or make_mesh()
        self.dtype = dtype
        self.chunk_p = chunk_p
        self.normalize = normalize
        self.prune_centroids = prune_centroids
        self.pq_m = pq_m
        self.pq_opq = pq_opq
        import jax

        if impl == "auto":
            impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
        if quantize_queries and dtype in ("int8", "int4", "pq") \
                and impl == "pallas" and not (dtype == "pq" and pq_opq):
            # OPQ engines stay on the plain kernel: pqfull's int8 x int8
            # fast path needs COMPACT books (one contribution per lane —
            # pallas_maxsim.score_int8 gate), so with expanded books the
            # quantized queries just cast back up to bf16: identical dot
            # cost, strictly extra quantization error
            impl = "pallas_q8"
        self.impl = impl
        # multi-host deployments (one process per pod host, wired by
        # parallel/multihost.init_multihost + a global mesh): builds route
        # through build_multihost_index (each host loads only its rows) and
        # replication/fetches through the process-global helpers
        self._multiproc = jax.process_count() > 1
        self.index: Optional[ShardedIndex] = None
        self.summary: Optional[ShardedIndex] = None
        # incremental updates (add/delete): new docs accumulate in host
        # buffers and serve from a small device-side TAIL index merged into
        # every search; deletions are tombstoned global indices. add() only
        # appends to _tail_parts (O(batch)); the device tail materializes
        # lazily on the next search (_ensure_tail), so a burst of adds pays
        # ONE consolidation + rebuild instead of one per call.
        self.tail: Optional[ShardedIndex] = None
        self._tail_P: Optional[np.ndarray] = None
        self._tail_pm: Optional[np.ndarray] = None
        self._tail_parts: list = []
        self._tail_dirty: bool = False
        self._tail_ids: list = []
        self._tombstones: set = set()
        self._next_auto_id: Optional[int] = None

    def _replicate(self, x):
        if self._multiproc:
            from evdr_tpu.parallel.multihost import replicate_global

            return replicate_global(np.asarray(x), self.mesh)
        return replicate(x, self.mesh)

    def _fetch(self, x) -> np.ndarray:
        """Global array -> host numpy. Search/score outputs on a single-host
        mesh are already fully addressable; across processes they gather
        with bounded per-device memory (multihost.gather_to_host — a
        cached-program chunked reshard, not a per-call jit)."""
        if self._multiproc:
            from evdr_tpu.parallel.multihost import gather_to_host

            return gather_to_host(x, self.mesh)
        return np.asarray(x)

    def _reset_incremental(self) -> None:
        """A (re)build supersedes any incremental state: stale tails or
        tombstones from a previous corpus must not leak into the new one."""
        self.tail = None
        self._tail_P = self._tail_pm = None
        self._tail_parts = []
        self._tail_dirty = False
        self._tail_ids = []
        self._tombstones = set()
        self._next_auto_id = None
        self._docid_lut_cache = None

    def _sdtype(self) -> str:
        """Storage tier for the pruning summary index: the explicit
        ``summary_dtype`` override, else the engine dtype (bf16 for PQ —
        stage 1 has no codebooks)."""
        if self.summary_dtype is not None:
            return self.summary_dtype
        return "bfloat16" if self.dtype == "pq" else self.dtype

    def _build_index(self, P, pmask, docids=None, dtype=None, scales=None,
                     streaming: bool = False) -> ShardedIndex:
        ids = np.asarray(docids, dtype=object) if docids is not None else None
        if self._multiproc:
            from evdr_tpu.parallel.multihost import build_multihost_index

            # inherently streamed: each host device_puts only its own rows
            return build_multihost_index(P, pmask, self.mesh, docids=ids,
                                         dtype=dtype, pad_docs_to=64,
                                         scales=scales)
        return build_sharded_index(P, pmask, self.mesh, docids=ids,
                                   dtype=dtype, pad_docs_to=64, scales=scales,
                                   streaming=streaming)

    # ------------------------------------------------------------------ build
    def build(self, P: np.ndarray, pmask: np.ndarray,
              docids: Optional[Sequence[str]] = None,
              streaming: bool = False,
              normalize: Optional[bool] = None) -> "RetrievalEngine":
        """Index dense padded page embeddings ``(N, Lp, D)`` + bool mask.

        ``streaming=True`` device-puts shard by shard without a full host
        copy (requires pre-normalized input — normalize False — and no
        pruning summary; pairs with mmap-backed arrays for GB-scale files).
        ``normalize`` overrides the engine default for THIS build only —
        from_npz passes False for files stored pre-normalized; mutating
        ``self.normalize`` instead would silently skip normalization on a
        LATER build() with raw embeddings on the same engine.
        """
        self._reset_incremental()
        normalize = self.normalize if normalize is None else normalize
        if streaming and not (normalize is False
                              and self.prune_centroids == 0
                              and self.dtype != "pq"):
            raise ValueError("streaming build needs normalize=False, "
                             "prune_centroids=0 and a non-pq dtype (each "
                             "touches the full array)")
        if not streaming:
            P = np.asarray(P, dtype=np.float32)
            pmask = np.asarray(pmask, dtype=bool)
        if normalize:
            P = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)),
                           dtype=np.float32)
        if self.dtype == "pq":
            from evdr_tpu.ops.pq import (encode_pq, encode_pq_device,
                                         expand_books, train_opq, train_pq)

            # codebooks train on a 65k-token host sample (seconds); the
            # O(corpus) encode goes to the accelerator past ~2M tokens
            # (host numpy takes minutes at 1M pages; argmin ties may
            # resolve differently — both are true nearest centroids)
            enc = (encode_pq_device
                   if P.shape[0] * P.shape[1] > 2_000_000 else encode_pq)
            if self.pq_opq:
                books, rot = train_opq(P, pmask, m=self.pq_m)
                codes = enc(P, books, pmask, rot=rot)
                books = expand_books(books, rot)
            else:
                books = train_pq(P, pmask, m=self.pq_m)
                codes = enc(P, books, pmask)
            self.build_from_pq(codes, books, pmask, docids=docids,
                               expanded=self.pq_opq)
        else:
            self.index = self._build_index(P, pmask, docids=docids,
                                           dtype=self.dtype,
                                           streaming=streaming)
        if self.prune_centroids > 0:
            from evdr_tpu.ops.pruned import build_summary_tokens

            S, smask = build_summary_tokens(P, pmask, self.prune_centroids)
            self.summary = self._build_index(S, smask,
                                             dtype=self._sdtype())
        return self

    def build_from_codes(self, codes, scales, pmask,
                         docids: Optional[Sequence[str]] = None,
                         streaming: bool = False) -> "RetrievalEngine":
        """Index pre-quantized int8 codes + per-token scales DIRECTLY — no
        dequantize/renormalize/requantize round trip. Codes must come from
        normalized embeddings (packed files written with --normalize); with
        ``streaming=True`` an mmap-backed file streams shard-by-shard to the
        devices with bounded host RSS."""
        self._reset_incremental()
        if self.dtype != "int8":
            raise ValueError("build_from_codes requires dtype='int8'")
        self.index = self._build_index(codes, pmask, docids=docids,
                                       dtype="int8", scales=scales,
                                       streaming=streaming)
        return self

    def build_from_codes4(self, packed, scales, pmask,
                          docids: Optional[Sequence[str]] = None,
                          streaming: bool = False) -> "RetrievalEngine":
        """Index pre-packed int4 codes + per-token scales directly
        (tools/convert_packed.py --dtype int4 --normalize) — no unpack/
        requantize round trip; mmap-backed files stream shard-by-shard."""
        self._reset_incremental()
        if self.dtype != "int4":
            raise ValueError("build_from_codes4 requires dtype='int4'")
        self.index = self._build_index(np.asarray(packed, np.uint8), pmask,
                                       docids=docids, dtype="int4",
                                       scales=scales, streaming=streaming)
        return self

    def build_from_pq(self, codes, books, pmask,
                      docids: Optional[Sequence[str]] = None,
                      expanded: bool = False) -> "RetrievalEngine":
        """Index pre-trained PQ codes + codebooks directly (ops/pq.py;
        packed files written with --dtype pq). Codes shard over the doc
        axis like any index; the small codebooks replicate.

        ``expanded=True`` marks full-width (M, K, D) OPQ codebooks
        (ops/pq.expand_books). Scoring paths detect the layout from the
        query dim, but shape-only consumers (e.g. evdr-serve's warm-up,
        which must derive D with no query in hand) read the recorded
        ``index.books_expanded`` flag — the layouts are ambiguous from the
        books tensor alone."""
        self._reset_incremental()
        if self.dtype != "pq":
            raise ValueError("build_from_pq requires dtype='pq'")
        self.index = self._build_index(np.asarray(codes, np.uint8),
                                       pmask, docids=docids)
        self.index.books = self._replicate(
            jnp.asarray(np.asarray(books, np.float32)))
        self.index.books_expanded = bool(expanded)
        return self

    def build_from_ragged(self, documents_obj, doc_attnmask=None, doc_imgmask=None,
                          docids=None) -> "RetrievalEngine":
        P, pmask, _ = preprocess_docs(documents_obj, doc_attnmask, doc_imgmask)
        return self.build(P, pmask, docids)

    # ---------------------------------------------------------- incremental
    def add(self, P_new, pmask_new, docids: Optional[Sequence[str]] = None,
            normalize: Optional[bool] = None) -> int:
        """Append documents WITHOUT rebuilding the main index.

        New docs accumulate in host-side float buffers and serve from a
        small device-side tail index (same storage dtype as the main one —
        PQ tails encode against the EXISTING codebooks, including expanded
        OPQ books) that every search scores and merges exactly. add()
        itself only appends to the pending host buffers — O(batch); the
        device tail is (re)built lazily on the next search, so a burst of
        adds pays ONE O(tail) rebuild. Fold a large tail into the main
        index with :meth:`compact` when convenient.

        Adding an EXISTING docid is an UPSERT: the old row is tombstoned
        in the same call, so searches and ``delete`` see exactly one row
        per id. Auto-assigned ids (no ``docids``) never collide with live
        ids. Returns the number of docs added.

        Under a multi-process deployment this is a COLLECTIVE: every
        process must call it with identical arguments (evdr-serve's
        coordinator broadcasts the mutation; see
        parallel/multihost.MultihostSearchCoordinator.add) — the host-side
        bookkeeping is deterministic, so all processes stay bit-identical
        and the lazily-built tail assembles per-host rows like any
        multihost index build."""
        if self.index is None:
            raise RuntimeError("add() needs a built index; call build()")
        normalize = self.normalize if normalize is None else normalize
        P_new = np.asarray(P_new, dtype=np.float32)
        pm_new = np.asarray(pmask_new, dtype=bool)
        # validate BEFORE mutating: adds are lazy (the tail materializes on
        # the next search), so a malformed batch accepted here would wedge
        # every later search/compact/save with no recovery path — via
        # evdr-serve that is a remote, permanent 500 from one bad POST /add
        if P_new.ndim != 3 or P_new.shape[-1] != self.dim:
            raise ValueError(
                f"add() embeddings must be (n, Lp, {self.dim}); "
                f"got {P_new.shape}")
        if pm_new.shape != P_new.shape[:2]:
            raise ValueError(
                f"pmask shape {pm_new.shape} does not match docs "
                f"{P_new.shape[:2]}")
        if normalize:
            P_new = np.asarray(
                l2_normalize(P_new * pm_new[..., None].astype(np.float32)),
                dtype=np.float32)
        n_new = P_new.shape[0]
        lut = self._docid_lut()
        if docids is not None:
            ids = [str(d) for d in docids]
            if len(ids) != n_new:
                raise ValueError(f"{len(ids)} docids for {n_new} docs")
            if len(set(ids)) != len(ids):
                raise ValueError("duplicate docids within one add()")
            # UPSERT semantics: adding an existing docid supersedes the old
            # row (it is tombstoned here) — otherwise delete() would only
            # reach one of two rows answering to the same id
            for d in ids:
                old = lut.get(d)
                if old is not None:
                    self._tombstones.add(old)
        else:
            # auto ids must never collide with live ids (positional ids
            # survive compaction's renumbering, so a fresh counter from
            # n_docs could land on an existing string). The counter
            # initializes ONCE past the max live numeric id and stays
            # monotonic — amortized O(1) per id, not a per-add linear scan
            if self._next_auto_id is None:
                mx = self.index.n_docs + len(self._tail_ids) - 1
                for s in lut:
                    if s.isdigit():
                        mx = max(mx, int(s))
                self._next_auto_id = mx + 1
            ids = []
            nxt = self._next_auto_id
            while len(ids) < n_new:
                if str(nxt) not in lut:  # defensive; counter starts past max
                    ids.append(str(nxt))
                nxt += 1
            self._next_auto_id = nxt
        # O(batch): the Lp-unifying concatenation is deferred to the next
        # search's tail materialization (_ensure_tail -> _consolidate_tail)
        self._tail_parts.append((P_new, pm_new))
        self._tail_ids.extend(ids)
        self._tail_dirty = True
        self._docid_lut_cache = None
        return n_new

    def add_ragged(self, documents_obj, doc_attnmask=None, doc_imgmask=None,
                   docids=None) -> int:
        P, pmask, _ = preprocess_docs(documents_obj, doc_attnmask,
                                      doc_imgmask)
        return self.add(P, pmask, docids=docids)

    def _consolidate_tail(self) -> None:
        """Fold pending add() batches into the contiguous tail buffers,
        unifying token widths (one concatenation per burst of adds, not
        one per add — 1k sequential adds would otherwise copy the growing
        tail quadratically)."""
        if not self._tail_parts:
            return
        parts = ([] if self._tail_P is None
                 else [(self._tail_P, self._tail_pm)]) + self._tail_parts
        lp = max(p.shape[1] for p, _ in parts)

        def pad_lp(x, fill):
            if x.shape[1] == lp:
                return x
            pad = [(0, 0), (0, lp - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
            return np.pad(x, pad, constant_values=fill)

        self._tail_P = np.concatenate([pad_lp(p, 0.0) for p, _ in parts],
                                      axis=0)
        self._tail_pm = np.concatenate([pad_lp(m, False) for _, m in parts],
                                       axis=0)
        self._tail_parts = []

    def _ensure_tail(self) -> None:
        """Materialize the device tail from pending adds (lazy — the cost
        of a burst of add() calls lands on the FIRST search after it).
        Collective under multihost: entered SPMD by every process with
        identical pending state."""
        if self._tail_dirty:
            self._consolidate_tail()
            self._rebuild_tail()
            self._tail_dirty = False

    def _rebuild_tail(self) -> None:
        if self.dtype == "pq":
            from evdr_tpu.ops.pq import encode_with_books

            books_host = np.asarray(self.index.books)
            codes = encode_with_books(self._tail_P, books_host,
                                      self._tail_pm)
            tail = self._build_index(codes, self._tail_pm)
            tail.books = self.index.books
            tail.books_expanded = getattr(self.index, "books_expanded",
                                          False)
        else:
            tail = self._build_index(self._tail_P, self._tail_pm,
                                     dtype=self.dtype)
        self.tail = tail

    _docid_lut_cache: Optional[dict] = None

    def _docid_lut(self) -> dict:
        if self._docid_lut_cache is None:
            n_main = self.index.n_docs
            if self.index.docids is not None:
                lut = {str(d): i for i, d in
                       enumerate(self.index.docids[:n_main])}
            else:
                lut = {str(i): i for i in range(n_main)}
            for j, d in enumerate(self._tail_ids):
                lut[str(d)] = n_main + j
            self._docid_lut_cache = lut
        return self._docid_lut_cache

    def delete(self, docids: Sequence[str]) -> int:
        """Tombstone documents by docid: they stop appearing in search
        results immediately (filtered at the merge — the stored rows are
        untouched until a rebuild). Returns how many were newly deleted;
        unknown docids are ignored."""
        if self.index is None:
            raise RuntimeError("delete() needs a built index")
        lut = self._docid_lut()
        removed = 0
        for d in docids:
            i = lut.get(str(d))
            if i is not None and i not in self._tombstones:
                self._tombstones.add(i)
                removed += 1
        return removed

    def _materialize_rows(self):
        """Host-side (P_or_codes, pmask, scales|None, docids) of the
        CURRENT logical corpus — main + tail rows minus tombstones, token
        widths unified. Shared by compact() and save_npz(); an EXPLICIT
        O(corpus) fetch (PCIe on a real TPU host). Collective under
        multihost: every process gathers the full rows (bounded device
        memory via gather_to_host) and computes identical results."""
        self._ensure_tail()
        n_main = self.index.n_docs
        n_tail = 0 if self.tail is None else self.tail.n_docs
        keep = np.array([i for i in range(n_main + n_tail)
                         if i not in self._tombstones], np.int64)
        ids = [r[0] for r in self.ids_for(keep[:, None])]

        def fetch(idx_obj, n):
            # _fetch routes through multihost.gather_to_host when shards
            # live on other processes; single-process it is np.asarray
            P = self._fetch(idx_obj.P[:n])
            pm = self._fetch(idx_obj.pmask[:n])
            sc = (None if idx_obj.scales is None
                  else self._fetch(idx_obj.scales[:n]))
            return P, pm, sc

        Pm, pmm, scm = fetch(self.index, n_main)
        if n_tail:
            Pt, pmt, sct = fetch(self.tail, n_tail)
            lp = max(pmm.shape[1], pmt.shape[1])

            def pad_rows(x, width, fill=0):
                if x is None or x.shape[1] == width:
                    return x
                pad = [(0, 0), (0, width - x.shape[1])] + \
                    [(0, 0)] * (x.ndim - 2)
                return np.pad(x, pad, constant_values=fill)

            if self.dtype == "int4":
                # token-PAIR packed codes can't be row-padded when the
                # shorter side's Lp is odd (the new token would have to
                # share its byte) — unpack/repack is lossless on codes
                from evdr_tpu.ops.int4 import quantize_tokens_int4, \
                    unpack_int4

                def repack(codes, pm_, sc_, width):
                    dec = unpack_int4(codes, lp=pm_.shape[1]).astype(
                        np.float32) * np.asarray(sc_)[..., None]
                    dec = pad_rows(dec, width)
                    return quantize_tokens_int4(dec, pad_rows(pm_, width,
                                                              False))

                # round-trips exactly: dequant -> requant of an int4 grid
                # reproduces the codes (scale is per token, unchanged)
                Pm, scm = repack(Pm, pmm, scm, lp)
                Pt, sct = repack(Pt, pmt, sct, lp)
            else:
                Pm, Pt = pad_rows(Pm, lp), pad_rows(Pt, lp)
            pmm, pmt = pad_rows(pmm, lp, False), pad_rows(pmt, lp, False)
            scm = pad_rows(scm, lp)
            sct = pad_rows(sct, lp)
            P = np.concatenate([Pm, Pt], axis=0)[keep]
            pm = np.concatenate([pmm, pmt], axis=0)[keep]
            sc = (None if scm is None
                  else np.concatenate([scm, sct], axis=0)[keep])
        else:
            P, pm = Pm[keep], pmm[keep]
            sc = None if scm is None else scm[keep]
        return P, pm, sc, ids

    def to_packed_payload(self) -> dict:
        """The CURRENT logical corpus (tail merged, tombstones dropped) as
        a packed-npz dict (tools/convert_packed.py format) — the
        durability path for incrementally-updated indexes: save, then
        ``from_npz`` on any engine of the same dtype reproduces this
        index exactly (no requantization round trip). Collective under
        multihost (every process materializes the rows); typically only
        process 0 consumes the payload (see save_npz)."""
        if self.index is None:
            raise RuntimeError("to_packed_payload() needs a built index")
        P, pm, sc, ids = self._materialize_rows()
        # the stored rows ARE the engine's final serving representation —
        # loaders must consume them as-is (direct codes, no renorm /
        # requant), which is what the normalized marker means
        out = {"pmask": pm, "docid": np.asarray([str(i) for i in ids]),
               "doc_normalized": np.asarray(True)}
        if self.dtype == "pq":
            out["P_pq_codes"] = P
            out["P_pq_books"] = np.asarray(self.index.books)
            if getattr(self.index, "books_expanded", False):
                out["P_pq_expanded"] = np.asarray(True)
        elif self.dtype == "int8":
            out["P_codes"], out["P_scale"] = P, sc
        elif self.dtype == "int4":
            out["P_codes4"], out["P_scale"] = P, sc
        elif self.dtype == "bfloat16":
            out["P_pad_bf16"] = P.view(np.uint16)  # ml_dtypes bf16 bits
        else:
            out["P_pad"] = np.asarray(P, np.float32)
        return out

    @staticmethod
    def write_packed_npz(path, payload: dict) -> None:
        """Atomic packed-npz write (tmp + rename; the tmp file is cleaned
        up if the write itself fails — disk-full aborts must not orphan a
        corpus-sized partial file). Split out from :meth:`save_npz` so a
        server can materialize the payload under its dispatch lock and do
        the multi-second disk write OUTSIDE it."""
        import os

        tmp = str(path) + ".tmp.npz"
        try:
            np.savez(tmp, **payload)
            os.replace(tmp, str(path))
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def save_npz(self, path) -> None:
        """Persist the current logical corpus as a packed npz (see
        :meth:`to_packed_payload`); written atomically so a crash
        mid-write can't corrupt the serving artifact. Collective under
        multihost — every process materializes (the gathers are
        collectives) but only process 0 touches the filesystem, matching
        the train CLI's artifact convention."""
        payload = self.to_packed_payload()
        if self._multiproc:
            import jax

            if jax.process_index() != 0:
                return
        self.write_packed_npz(path, payload)

    def compact(self) -> "RetrievalEngine":
        """Fold the tail into the main index and physically drop
        tombstoned rows — an EXPLICIT O(corpus) maintenance operation
        (fetches the stored rows to host and rebuilds through the standard
        path; on a real TPU host that is PCIe traffic, not tunnel RTT).
        External docids are preserved: rows keep the exact id strings
        searches returned before compaction, including the positional ids
        of indexes built without docids. Collective under multihost: every
        process materializes the full corpus (host RSS = one corpus copy
        per host during the rebuild) and assembles its own shard rows."""
        if self.index is None:
            raise RuntimeError("compact() needs a built index")
        if not self._tail_ids and not self._tombstones:
            return self
        P, pm, sc, ids = self._materialize_rows()
        books = getattr(self.index, "books", None)
        expanded = getattr(self.index, "books_expanded", False)
        summary_k = self.prune_centroids
        # crash safety: a failed rebuild (device OOM, transient tunnel
        # error) must NOT leave the old index serving with emptied
        # tombstones/tail — deleted docs would silently resurrect and
        # added ones vanish. Snapshot, attempt, restore on any failure.
        snapshot = (self.index, self.summary, self.tail, self._tail_P,
                    self._tail_pm, list(self._tail_parts), self._tail_dirty,
                    list(self._tail_ids), set(self._tombstones),
                    self._next_auto_id, self._docid_lut_cache)
        self._reset_incremental()
        try:
            self._compact_build(P, pm, sc, ids, books, expanded, summary_k)
        except BaseException:
            (self.index, self.summary, self.tail, self._tail_P,
             self._tail_pm, self._tail_parts, self._tail_dirty,
             self._tail_ids, self._tombstones, self._next_auto_id,
             self._docid_lut_cache) = snapshot
            raise
        return self

    def _compact_build(self, P, pm, sc, ids, books, expanded,
                       summary_k) -> None:
        if self.dtype == "pq":
            self.build_from_pq(P, np.asarray(books), pm, docids=ids,
                               expanded=expanded)
        elif self.dtype == "int8":
            self.build_from_codes(P, sc, pm, docids=ids)
        elif self.dtype == "int4":
            self.build_from_codes4(P, sc, pm, docids=ids)
        else:
            self.index = self._build_index(
                np.asarray(P, np.float32), pm, docids=ids,
                dtype=self.dtype)
        if summary_k > 0:
            # rebuild the pruning summaries from the stored rows — for
            # quantized tiers that means the dequantized reconstructions,
            # which is exactly what stage-2 reranking scores anyway
            from evdr_tpu.ops.pruned import (build_summary_tokens,
                                             build_summary_tokens_from_pq)

            if self.dtype == "pq":
                # chunked decode: a one-shot reconstruction of a multi-M-
                # page corpus is a many-GB f32 host spike
                S, smask = build_summary_tokens_from_pq(
                    P, np.asarray(books), pm, summary_k, expanded=expanded)
                self.summary = self._build_index(S, smask,
                                                 dtype=self._sdtype())
                return
            if self.dtype == "int8":
                from evdr_tpu.ops.quantize import dequantize_int8

                Pf = dequantize_int8(P, sc)
            elif self.dtype == "int4":
                from evdr_tpu.ops.int4 import dequantize_int4

                Pf = dequantize_int4(P, sc)
            else:
                Pf = np.asarray(P, np.float32)
            S, smask = build_summary_tokens(Pf, pm, summary_k)
            self.summary = self._build_index(S, smask,
                                             dtype=self._sdtype())

    def _merge_tail(self, Qd, qmd, vals, idx, k: int):
        """Merge main-index results with the tail index + apply
        tombstones: (nq, <=k) exact merged top-k."""
        n_main = self.index.n_docs
        parts_v = [np.asarray(vals)]
        parts_i = [np.asarray(idx)]
        if self.tail is not None:
            # bucket like k_main: repeated deletes must not recompile
            kt = min(-(-(k + len(self._tombstones)) // 32) * 32,
                     self.tail.n_docs)
            tv, ti = sharded_topk(Qd, qmd, self.tail, k=kt,
                                  chunk_p=self.chunk_p, impl=self.impl)
            parts_v.append(self._fetch(tv))
            parts_i.append(np.asarray(self._fetch(ti)) + n_main)
        v = np.concatenate(parts_v, axis=1)
        gi = np.concatenate(parts_i, axis=1)
        if self._tombstones:
            dead = np.isin(gi, np.fromiter(self._tombstones, dtype=np.int64))
            v = np.where(dead, -np.inf, v)
        order = np.argsort(-v, axis=1, kind="stable")
        k_out = min(k, self.n_docs)
        take = order[:, :k_out]
        return (np.take_along_axis(v, take, axis=1),
                np.take_along_axis(gi, take, axis=1))

    @classmethod
    def from_npz(cls, npz_path, mmap: bool = False, **kw) -> "RetrievalEngine":
        """Accepts the reference's pickled-object interchange npz or the
        packed dense format (tools/convert_packed.py, any storage dtype).

        ``mmap=True`` (packed files): doc arrays memory-map from disk and
        stream shard-by-shard to the devices — peak anonymous host RSS stays
        bounded for GB-scale indexes. Requires a ``--normalize``-written file
        (otherwise the host-side renormalization touches everything and the
        flag quietly degrades to an ordinary load). int8 files additionally
        skip the dequantize->requantize round trip (codes consumed directly).
        """
        from evdr_tpu.tools.convert_packed import is_packed, load_packed_payload

        eng = cls(**kw)
        if is_packed(npz_path):
            payload = load_packed_payload(npz_path, mmap_docs=mmap)
            normalized = bool(payload.get("doc_normalized", False))
            docids = payload.get("docid")
            if "P_pq_codes" in payload:
                if eng.dtype == "pq":
                    expanded = bool(payload.get("P_pq_expanded", False))
                    eng.build_from_pq(
                        payload["P_pq_codes"], payload["P_pq_books"],
                        payload["pmask"], docids=docids, expanded=expanded)
                    if eng.prune_centroids > 0:
                        # the float tokens are gone; summaries built from
                        # the decoded reconstructions are exactly what the
                        # PQ rerank stage scores anyway (same convention
                        # as compact()) — the PLAID-combo engine round-
                        # trips through save_npz/from_npz. Chunked decode:
                        # a one-shot reconstruction of a multi-M-page file
                        # is a many-GB f32 host spike.
                        from evdr_tpu.ops.pruned import (
                            build_summary_tokens_from_pq)

                        S, smask = build_summary_tokens_from_pq(
                            payload["P_pq_codes"], payload["P_pq_books"],
                            payload["pmask"], eng.prune_centroids,
                            expanded=expanded)
                        eng.summary = eng._build_index(
                            S, smask, dtype=eng._sdtype())
                    return eng
                if "P_pad" not in payload:
                    # PQ file + float/int8 engine under mmap (the eager
                    # loader already reconstructed P_pad): decode here
                    from evdr_tpu.ops.pq import decode_pq

                    payload["P_pad"] = decode_pq(
                        payload["P_pq_codes"], payload["P_pq_books"],
                        expanded=bool(payload.get("P_pq_expanded", False)))
            if (eng.dtype == "int8" and "P_codes" in payload and normalized
                    and eng.prune_centroids == 0):
                return eng.build_from_codes(
                    payload["P_codes"], payload["P_scale"], payload["pmask"],
                    docids=docids, streaming=mmap)
            if (eng.dtype == "int4" and "P_codes4" in payload and normalized
                    and eng.prune_centroids == 0):
                return eng.build_from_codes4(
                    payload["P_codes4"], payload["P_scale"],
                    payload["pmask"], docids=docids, streaming=mmap)
            if "P_pad" not in payload:
                # mmap int8/int4 without the --normalize marker: dequantize
                # here (the bounded-RSS guarantee needs a normalized file)
                if "P_codes4" in payload:
                    from evdr_tpu.ops.int4 import dequantize_int4

                    payload["P_pad"] = dequantize_int4(payload["P_codes4"],
                                                       payload["P_scale"])
                else:
                    from evdr_tpu.ops.quantize import dequantize_int8

                    payload["P_pad"] = dequantize_int8(payload["P_codes"],
                                                       payload["P_scale"])
            eng.build(payload["P_pad"], payload["pmask"], docids=docids,
                      # int4 engines can't quantize-on-stream (sharded_
                      # index raises); a float/int8 file under an int4
                      # engine degrades to an eager quantizing build
                      # rather than dying at startup
                      streaming=(mmap and normalized
                                 and eng.prune_centroids == 0
                                 and eng.dtype != "int4"),
                      # stored normalized: skip the renorm for THIS build
                      normalize=False if normalized else None)
        else:
            payload = load_payload(npz_path)
            if eng.dtype == "pq" and payload.get("qat_books") is not None:
                # a QAT-pq student (evdr-train --qat pq): quantize with the
                # exact codebooks it was trained and best-selected against
                # — a fresh refit would serve a different grid than the one
                # the checkpoint's metrics were measured under
                from evdr_tpu.data.packing import preprocess_docs
                from evdr_tpu.ops.pq import encode_with_books

                P, pmask, _ = preprocess_docs(
                    payload["documents"], payload.get("doc_attnmask"),
                    payload.get("doc_imgmask"))
                Pn = np.asarray(l2_normalize(
                    P * pmask[..., None].astype(np.float32)), np.float32)
                books = np.asarray(payload["qat_books"], np.float32)
                eng.pq_m = int(books.shape[0])
                eng.build_from_pq(encode_with_books(Pn, books, pmask), books,
                                  pmask, docids=payload.get("docid"))
            else:
                eng.build_from_ragged(
                    payload["documents"], payload.get("doc_attnmask"),
                    payload.get("doc_imgmask"), docids=payload.get("docid"))
        return eng

    # ----------------------------------------------------------------- search
    def search_dense(self, Q: np.ndarray, qmask: np.ndarray, k: int = 10,
                     n_candidates: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """(nq, Lq, D) normalized queries + mask -> (scores, doc indices).

        With ``n_candidates`` (and a prune-enabled engine), runs the two-stage
        pruned search: summary-index top-n_candidates, then exact rerank.
        """
        if self.index is None:
            raise RuntimeError("engine has no index; call build() first")
        if n_candidates and self.summary is None:
            # silently falling through to the exact full scan made a
            # prune-misconfigured engine look like "pruning doesn't help"
            raise ValueError(
                "n_candidates requires a pruning summary index: construct "
                "the engine with prune_centroids>0 and build() from float "
                "embeddings (build_from_codes has no summary)")
        self._ensure_tail()  # pending adds materialize on first search
        Qd = self._replicate(jnp.asarray(Q, dtype=jnp.float32))
        qmd = self._replicate(jnp.asarray(qmask, dtype=bool))
        merging = self.tail is not None or bool(self._tombstones)
        if merging and not (n_candidates and self.summary is not None) \
                and self.mesh.devices.size == 1:
            # single-device serving: main + tail + tombstone filter + top-k
            # in ONE dispatched program. The alive mask is a dynamic arg, so
            # deletes never recompile; only an add() (tail shape change)
            # does. See parallel/topk._single_device_merged_topk.
            from evdr_tpu.parallel.topk import _single_device_merged_topk

            n_main = self.index.n_docs
            n_tail = 0 if self.tail is None else self.tail.n_docs
            alive = np.ones(n_main + n_tail, bool)
            if self._tombstones:
                alive[np.fromiter(self._tombstones, dtype=np.int64)] = False
            tail = self.tail
            vals, idx = _single_device_merged_topk(
                Qd, qmd, self.index.P, self.index.pmask,
                None if tail is None else tail.P,
                None if tail is None else tail.pmask,
                jnp.asarray(alive), k, self.chunk_p, self.impl,
                n_main, n_tail, scales_m=self.index.scales,
                scales_t=None if tail is None else tail.scales,
                books=getattr(self.index, "books", None))
            k_out = min(k, self.n_docs)
            return (self._fetch(vals)[:, :k_out],
                    self._fetch(idx)[:, :k_out])
        # pruned/mesh incremental path: over-fetch from the main index so
        # tombstoned rows can be filtered without shrinking the caller's k.
        # k feeds static-k jitted programs — bucket it up to multiples of
        # 32 so repeated deletes don't each force a fresh corpus-scale
        # compile (the extra over-fetch is sliced off at the merge)
        k_main = (min(-(-(k + len(self._tombstones)) // 32) * 32,
                      self.index.n_docs) if merging else k)
        if n_candidates and self.summary is not None:
            # over-fetch stage-1 candidates by the (bucketed, like k_main)
            # tombstone count: high-ranking dead docs still occupy summary
            # candidate slots, and without headroom they crowd alive pages
            # out of the rerank set after many deletes (pre-compact)
            c = int(n_candidates)
            if self._tombstones:
                c += -(-len(self._tombstones) // 32) * 32
            c = min(c, self.index.n_docs)
            if self.mesh.devices.size == 1:
                # both stages fused into one dispatched program (remote
                # backends pay ~30ms per dispatch); int8 indexes thread
                # their per-token scales through both stages
                from evdr_tpu.ops.pruned import pruned_topk_fused

                vals, idx = pruned_topk_fused(
                    Qd, qmd, self.index.P, self.index.pmask,
                    self.summary.P, self.summary.pmask, k=k_main, n_cand=c,
                    impl=self.impl, scales=self.index.scales,
                    sscales=self.summary.scales, books=self.index.books)
            else:
                from evdr_tpu.ops.pruned import rerank_candidates

                # hardware-approximate selection for candidate generation
                # (exact top_k's compile blows up at large k; rerank is exact)
                _, cand = sharded_topk(Qd, qmd, self.summary, k=c,
                                       chunk_p=self.chunk_p, impl=self.impl,
                                       approx=True)
                vals, idx = rerank_candidates(Qd, qmd, self.index.P,
                                              self.index.pmask, cand,
                                              k=k_main,
                                              scales=self.index.scales,
                                              books=self.index.books)
        else:
            vals, idx = sharded_topk(Qd, qmd, self.index, k=k_main,
                                     chunk_p=self.chunk_p, impl=self.impl)
        if merging:
            return self._merge_tail(Qd, qmd, self._fetch(vals),
                                    self._fetch(idx), k)
        return self._fetch(vals), self._fetch(idx)

    def ids_for(self, idx) -> List[List[str]]:
        """Doc-index matrix -> per-query docid string lists (tail docs
        carry the ids passed to add())."""
        idx = np.asarray(idx)
        n_main = 0 if self.index is None else self.index.n_docs

        def one(j):
            j = int(j)
            if j >= n_main:
                return str(self._tail_ids[j - n_main])
            if self.index is not None and self.index.docids is not None:
                return str(self.index.docids[j])
            return str(j)

        return [[one(j) for j in row] for row in idx]

    def search(self, queries, query_attnmask=None, k: int = 10,
               n_candidates: Optional[int] = None
               ) -> Tuple[List[List[str]], np.ndarray]:
        """Ragged query token arrays -> (per-query docid lists, scores).

        ``n_candidates`` (on a prune-enabled engine) routes through the
        two-stage pruned search, same as ``search_dense``.
        """
        Q, qmask = preprocess_queries(queries, query_attnmask)
        vals, idx = self.search_dense(Q, qmask, k=k, n_candidates=n_candidates)
        return self.ids_for(idx), vals

    def score_all(self, Q: np.ndarray, qmask: np.ndarray) -> np.ndarray:
        """Full (nq, N) score matrix (eval / reranking use). With
        incremental state, N covers main + tail docs and tombstoned
        columns are -inf (they can never rank)."""
        if self.index is None:
            raise RuntimeError("engine has no index; call build() first")
        self._ensure_tail()
        Qd = self._replicate(jnp.asarray(Q, dtype=jnp.float32))
        qmd = self._replicate(jnp.asarray(qmask, dtype=bool))
        sc = self._fetch(
            sharded_maxsim(Qd, qmd, self.index, chunk_p=self.chunk_p,
                           impl=self.impl))
        if self.tail is not None:
            st = self._fetch(
                sharded_maxsim(Qd, qmd, self.tail, chunk_p=self.chunk_p,
                               impl=self.impl))
            sc = np.concatenate([np.asarray(sc), np.asarray(st)], axis=1)
        if self._tombstones:
            sc = np.asarray(sc).copy()
            sc[:, np.fromiter(self._tombstones, dtype=np.int64)] = -np.inf
        return sc

    @property
    def n_docs(self) -> int:
        """Searchable (alive) document count: main + tail - tombstones
        (tail counted from the host ids so pending, not-yet-materialized
        adds are already visible)."""
        if self.index is None:
            return 0
        return (self.index.n_docs + len(self._tail_ids)
                - len(self._tombstones))

    @property
    def dim(self) -> int:
        """Token embedding dim of the built index. PQ indexes store uint8
        codes, so D comes from the codebooks — whose layout (compact
        (M, K, D/M) vs expanded OPQ (M, K, D)) is ambiguous from shape
        alone; the builder records it as ``index.books_expanded``.
        Float/int8 read D off the stored tokens, and int4's token-pair
        packing (ops/int4.py) keeps full-width D lanes so the plain
        fallback covers it too."""
        if self.index is None:
            raise RuntimeError("engine has no index; call build() first")
        idx = self.index
        if idx.books is not None:
            b = idx.books
            return (int(b.shape[-1]) if getattr(idx, "books_expanded", False)
                    else int(b.shape[0] * b.shape[-1]))
        return int(idx.P.shape[-1])
