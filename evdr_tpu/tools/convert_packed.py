"""Convert interchange (pickled-object) feature npz -> TPU-friendly packed npz.

The interchange format stores per-page ragged arrays as numpy object dtype,
which forces single-threaded Python unpickling on every load. The packed
format is dense ``P_pad (N, L, D) float32/bf16 + pmask (N, L) bool`` (+ query
side + eval maps), mmap-able and sliceable per device shard without touching
Python objects. ``load_dataset_bundle`` consumes either transparently.

    python -m evdr_tpu.tools.convert_packed --in_npz dump_all.npz \
        --out_npz dump_all.packed.npz [--length_multiple 16]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from evdr_tpu.data.npz_io import load_payload
from evdr_tpu.data.packing import preprocess_docs, preprocess_queries


def convert_payload_to_packed(payload: dict, length_multiple: int = 1) -> dict:
    out = {}
    if payload.get("documents") is not None:
        P, pmask, _ = preprocess_docs(
            payload["documents"], payload.get("doc_attnmask"),
            payload.get("doc_imgmask"), length_multiple=length_multiple)
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


def load_packed_payload(npz_path) -> dict:
    """Packed npz -> a payload-like dict with DENSE arrays.

    Returns keys: P_pad/pmask, Q_norm/qmask (dense, pre-normalized), plus the
    usual id/map keys decoded from JSON.
    """
    z = np.load(str(npz_path))  # no allow_pickle needed: that's the point
    out = {k: z[k] for k in z.files if not k.endswith("_json")}
    for key in ("relevant_docs", "docidx_2_docid"):
        jk = f"{key}_json"
        if jk in z.files:
            out[key] = json.loads(str(z[jk]))
    return out


def is_packed(npz_path) -> bool:
    with np.load(str(npz_path), allow_pickle=True) as z:
        return "P_pad" in z.files or "Q_norm" in z.files


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in_npz", required=True)
    p.add_argument("--out_npz", required=True)
    p.add_argument("--length_multiple", type=int, default=1,
                   help="round padded lengths up (e.g. 16 for kernel tiles)")
    a = p.parse_args(argv)
    payload = load_payload(a.in_npz)
    packed = convert_payload_to_packed(payload, a.length_multiple)
    np.savez(a.out_npz, **packed)
    shapes = {k: getattr(v, "shape", None) for k, v in packed.items()}
    print(f"[packed] {a.out_npz}: {shapes}")


if __name__ == "__main__":
    main()
