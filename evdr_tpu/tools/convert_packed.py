"""Convert interchange (pickled-object) feature npz -> TPU-friendly packed npz.

The interchange format stores per-page ragged arrays as numpy object dtype,
which forces single-threaded Python unpickling on every load. The packed
format is dense ``P_pad (N, L, D) float32/bf16 + pmask (N, L) bool`` (+ query
side + eval maps), mmap-able and sliceable per device shard without touching
Python objects. ``load_dataset_bundle`` consumes either transparently.

    python -m evdr_tpu.tools.convert_packed --in_npz dump_all.npz \
        --out_npz dump_all.packed.npz [--length_multiple 16] \
        [--dtype float32|bfloat16|int8|int4|pq]

Storage dtypes (docs side only; queries stay float32 — they are tiny and
pre-normalized): ``bfloat16`` halves disk/RAM/IO for GB-scale corpora;
``int8`` stores per-token symmetric codes + f32 scales (ops/quantize.py),
~4x smaller than f32 with measured 0.000 nDCG@5 delta (RESULTS.md);
``int4`` packs two codes per byte (ops/int4.py — half of int8,
near-lossless, stores ``P_codes4`` + ``P_scale``); ``pq`` product-
quantizes to --pq_m bytes/token (ops/pq.py — 8x smaller than int8 at
D=128/M=16; lossy, stores ``P_pq_codes`` + ``P_pq_books``; ``--pq_opq``
adds an OPQ rotation folded into expanded books).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from evdr_tpu.data.npz_io import load_payload
from evdr_tpu.data.packing import preprocess_docs, preprocess_queries

PACKED_DTYPES = ("float32", "bfloat16", "int8", "int4", "pq")


def convert_payload_to_packed(payload: dict, length_multiple: int = 1,
                              dtype: str = "float32",
                              normalize: bool = False,
                              pq_m: int = 16, pq_opq: bool = False) -> dict:
    """``normalize=True`` stores doc tokens masked + L2-normalized (the form
    every consumer ends up computing anyway — harness and engine re-normalize
    idempotently) and marks the file, which lets int8 serving consume
    ``P_codes`` DIRECTLY (zero-copy mmap end-to-end, single quantization)
    instead of dequantize -> normalize -> requantize."""
    if dtype not in PACKED_DTYPES:
        raise ValueError(f"dtype must be one of {PACKED_DTYPES}, got {dtype!r}")
    out = {}
    if payload.get("documents") is not None:
        P, pmask, _ = preprocess_docs(
            payload["documents"], payload.get("doc_attnmask"),
            payload.get("doc_imgmask"), length_multiple=length_multiple)
        if normalize:
            from evdr_tpu.data.packing import l2_normalize

            P = np.asarray(
                l2_normalize(P * pmask[..., None].astype(np.float32)),
                dtype=np.float32)
            out["doc_normalized"] = np.asarray(True)
        if dtype == "int8":
            from evdr_tpu.ops.quantize import quantize_tokens_int8

            out["P_codes"], out["P_scale"] = quantize_tokens_int8(P, pmask)
        elif dtype == "int4":
            from evdr_tpu.ops.int4 import quantize_tokens_int4

            out["P_codes4"], out["P_scale"] = quantize_tokens_int4(P, pmask)
        elif dtype == "pq":
            from evdr_tpu.ops.pq import (encode_pq, encode_pq_device,
                                         expand_books, train_opq, train_pq)

            # accelerator encode past ~2M tokens (see engine.build)
            enc = (encode_pq_device
                   if P.shape[0] * P.shape[1] > 2_000_000 else encode_pq)
            if payload.get("qat_books") is not None and not pq_opq:
                # QAT-pq student: pack with the codebooks it was trained
                # and best-selected against, not a refit (engine.from_npz
                # does the same for the ragged file)
                books = np.asarray(payload["qat_books"], np.float32)
                out["P_pq_codes"] = enc(P, books, pmask)
                out["P_pq_books"] = books
            elif pq_opq:
                books, rot = train_opq(P, pmask, m=pq_m)
                out["P_pq_codes"] = enc(P, books, pmask, rot=rot)
                # rotation folded into full-width books: consumers score/
                # decode them with sum semantics (ops/pq.py docstrings)
                out["P_pq_books"] = expand_books(books, rot)
                out["P_pq_expanded"] = np.asarray(True)
            else:
                books = train_pq(P, pmask, m=pq_m)
                out["P_pq_codes"] = enc(P, books, pmask)
                out["P_pq_books"] = books
        elif dtype == "bfloat16":
            import ml_dtypes

            # np.load round-trips ml_dtypes arrays as raw void — store the
            # uint16 bit pattern under a marker key instead
            out["P_pad_bf16"] = P.astype(ml_dtypes.bfloat16).view(np.uint16)
        else:
            out["P_pad"] = P.astype(np.float32)
        out["pmask"] = pmask
    if payload.get("query") is not None:
        Q, qmask = preprocess_queries(
            payload["query"], payload.get("query_attnmask"),
            length_multiple=length_multiple)
        out["Q_norm"] = Q.astype(np.float32)
        out["qmask"] = qmask
    for key in ("docid", "qid", "qsidx_2_query"):
        if payload.get(key) is not None:
            out[key] = np.asarray([str(x) for x in payload[key]])
    # dict-valued maps ride as JSON strings (no pickling)
    for key in ("relevant_docs", "docidx_2_docid"):
        if payload.get(key) is not None:
            out[f"{key}_json"] = np.asarray(json.dumps(payload[key]))
    return out


def _npz_member_memmap(npz_path, name: str) -> np.ndarray:
    """Zero-copy np.memmap view of one STORED member of an (uncompressed)
    npz. ``np.savez`` writes members with ZIP_STORED, so the raw .npy bytes
    sit contiguously in the outer file; we parse the zip local header + npy
    header to find the data offset and map it directly — GB-scale indexes
    load without a host RAM copy (pages stream from the OS cache)."""
    import zipfile

    member = name if name.endswith(".npy") else name + ".npy"
    with zipfile.ZipFile(str(npz_path)) as zf:
        info = zf.getinfo(member)
        if info.compress_type != zipfile.ZIP_STORED:
            raise ValueError(
                f"{npz_path}:{member} is compressed; mmap needs np.savez "
                "(uncompressed), not savez_compressed")
        with zf.open(info) as m:
            version = np.lib.format.read_magic(m)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(m)
            else:
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(m)
            npy_header = m.tell()
    with open(str(npz_path), "rb") as f:
        f.seek(info.header_offset + 26)
        nlen = int.from_bytes(f.read(2), "little")
        elen = int.from_bytes(f.read(2), "little")
    data_off = info.header_offset + 30 + nlen + elen + npy_header
    return np.memmap(str(npz_path), dtype=dtype, mode="r", offset=data_off,
                     shape=shape, order="F" if fortran else "C")


def load_packed_payload(npz_path, mmap_docs: bool = False) -> dict:
    """Packed npz -> a payload-like dict with DENSE arrays.

    Returns keys: P_pad/pmask, Q_norm/qmask (dense, pre-normalized), plus the
    usual id/map keys decoded from JSON. bf16-stored docs are upcast to f32
    (exact); int8-stored docs are dequantized to ``P_pad`` while the raw
    ``P_codes``/``P_scale`` ride along for engines that consume codes
    directly.

    ``mmap_docs=True`` returns the doc-axis arrays (P_pad / P_codes /
    P_scale / pmask) as zero-copy np.memmap views sliceable per device shard
    — peak host RSS stays bounded for GB-scale corpora. Note bf16- and
    int8-stored files still materialize the upcast/dequantized ``P_pad``; to
    stay mapped end-to-end, consume ``P_codes`` directly (RetrievalEngine
    does for dtype='int8').
    """
    mmap_keys = ({"P_pad", "P_codes", "P_codes4", "P_scale", "pmask",
                  "P_pq_codes"} if mmap_docs else set())
    out = {}
    # with-block: NpzFile holds an open fd until closed — long-lived
    # processes that load many files (eval_run, serving) must not leak one
    # per call. JSON sidecars are decoded inside the same open.
    with np.load(str(npz_path)) as z:  # no allow_pickle needed: the point
        json_files = [k for k in z.files if k.endswith("_json")]
        for k in z.files:
            if k.endswith("_json"):
                continue
            out[k] = (_npz_member_memmap(npz_path, k) if k in mmap_keys
                      else z[k])
        decoded_json = {jk: str(z[jk]) for jk in json_files}
    if "P_pad" in out and out["P_pad"].dtype != np.float32:
        out["P_pad"] = out["P_pad"].astype(np.float32)
    if "P_pad_bf16" in out:
        import ml_dtypes

        out["P_pad"] = (out.pop("P_pad_bf16").view(ml_dtypes.bfloat16)
                        .astype(np.float32))
    if "P_codes" in out and "P_pad" not in out and not mmap_docs:
        # mmap mode leaves codes undequantized (a dequantize materializes
        # the full f32 tensor, defeating the bounded-RSS point); consumers
        # that need floats (harness) use the default eager load
        from evdr_tpu.ops.quantize import dequantize_int8

        out["P_pad"] = dequantize_int8(out["P_codes"], out["P_scale"])
    if "P_codes4" in out and "P_pad" not in out and not mmap_docs:
        # same contract for packed-int4 files (ops/int4.py)
        from evdr_tpu.ops.int4 import dequantize_int4

        out["P_pad"] = dequantize_int4(out["P_codes4"], out["P_scale"])
    if "P_pq_codes" in out and "P_pad" not in out and not mmap_docs:
        # same contract for PQ files: eager loads reconstruct floats for
        # consumers that need them; raw codes/books ride along for engines
        # that score codes directly (RetrievalEngine dtype='pq')
        from evdr_tpu.ops.pq import decode_pq

        out["P_pad"] = decode_pq(out["P_pq_codes"], out["P_pq_books"],
                                 expanded=bool(out.get("P_pq_expanded",
                                                       False)))
    for key in ("relevant_docs", "docidx_2_docid"):
        jk = f"{key}_json"
        if jk in decoded_json:
            out[key] = json.loads(decoded_json[jk])
    return out


def is_packed(npz_path) -> bool:
    with np.load(str(npz_path), allow_pickle=True) as z:
        return ("P_pad" in z.files or "Q_norm" in z.files
                or "P_codes" in z.files or "P_pad_bf16" in z.files
                or "P_pq_codes" in z.files or "P_codes4" in z.files)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in_npz", required=True)
    p.add_argument("--out_npz", required=True)
    p.add_argument("--length_multiple", type=int, default=1,
                   help="round padded lengths up (e.g. 16 for kernel tiles)")
    p.add_argument("--dtype", choices=PACKED_DTYPES, default="float32",
                   help="doc-token storage dtype (bfloat16 halves, int8 "
                        "quarters the file vs float32)")
    p.add_argument("--normalize", action="store_true",
                   help="store doc tokens masked + L2-normalized (enables "
                        "direct int8-code serving without requantization)")
    p.add_argument("--pq_m", type=int, default=16,
                   help="PQ subspaces = bytes/token (--dtype pq)")
    p.add_argument("--pq_opq", action="store_true",
                   help="learn an OPQ rotation before encoding (--dtype pq; "
                        "lower quantization error at the same bytes)")
    a = p.parse_args(argv)
    payload = load_payload(a.in_npz)
    packed = convert_payload_to_packed(payload, a.length_multiple, a.dtype,
                                       normalize=a.normalize, pq_m=a.pq_m,
                                       pq_opq=a.pq_opq)
    np.savez(a.out_npz, **packed)
    shapes = {k: getattr(v, "shape", None) for k, v in packed.items()}
    print(f"[packed] {a.out_npz}: {shapes}")


if __name__ == "__main__":
    main()
