import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

from evdr_tpu.data.synthetic import make_synthetic_corpus, save_synthetic_npz
from evdr_tpu.tools.doc_unique import (
    dedup_companion_npz,
    dedup_npz,
    first_occurrence_keep,
    sanity_check_unique,
)
from evdr_tpu.tools.make_questions import generate_questions, parse_numbered_questions
from evdr_tpu.tools.report import parse_train_log, write_report
from evdr_tpu.tools.split_data import split_query_npz
from evdr_tpu.tools.xlsx import write_xlsx


# ---------------------------------------------------------------------------
# split_data
# ---------------------------------------------------------------------------

def test_split_query_npz(tmp_path):
    c = make_synthetic_corpus(n_docs=8, n_queries=20, dim=16, seed=0)
    src = tmp_path / "foo_dump_all.npz"
    save_synthetic_npz(src, c)

    train_p, test_p, idx_p = split_query_npz(src, tmp_path / "out",
                                             test_ratio=0.25, shuffle=True, seed=1)
    ztr = np.load(train_p, allow_pickle=True)
    zte = np.load(test_p, allow_pickle=True)
    assert len(zte["qid"]) == 5 and len(ztr["qid"]) == 15
    # docs duplicated into both
    assert len(ztr["docid"]) == len(zte["docid"]) == 8
    # relevant_docs filtered per split
    rel_tr = ztr["relevant_docs"].item()
    rel_te = zte["relevant_docs"].item()
    assert set(rel_tr) & set(rel_te) == set()
    # qsidx_2_query sliced consistently with queries
    assert len(ztr["qsidx_2_query"]) == 15
    # idx file reproducible
    zi = np.load(idx_p, allow_pickle=True)
    assert len(zi["train_idx"]) == 15 and int(zi["Nq"]) == 20


def test_split_rejects_bad_ratio(tmp_path):
    c = make_synthetic_corpus(n_docs=4, n_queries=5, dim=8, seed=0)
    src = tmp_path / "x_dump_all.npz"
    save_synthetic_npz(src, c)
    with pytest.raises(ValueError):
        split_query_npz(src, tmp_path, test_ratio=0.0)


# ---------------------------------------------------------------------------
# doc_unique
# ---------------------------------------------------------------------------

def test_first_occurrence_keep():
    keep = first_occurrence_keep(["a", "b", "a", "c", "b", "d"])
    np.testing.assert_array_equal(keep, [0, 1, 3, 5])


def test_dedup_npz_and_companion(tmp_path):
    c = make_synthetic_corpus(n_docs=6, n_queries=4, dim=8, seed=1)
    # duplicate docs 1 and 3
    dup = np.concatenate([np.arange(6), [1, 3]])
    dup_payload = dict(c)
    for k in ("docid", "documents", "doc_attnmask", "doc_imgmask"):
        dup_payload[k] = c[k][dup]
    src = tmp_path / "full.npz"
    save_synthetic_npz(src, dup_payload)

    out = tmp_path / "unique.npz"
    keep, docid_unique = dedup_npz(src, out)
    assert len(docid_unique) == 6
    z = np.load(out, allow_pickle=True)
    assert len(z["docid"]) == 6 and z["documents"].shape[0] == 6
    m = z["docidx_2_docid"].item()
    assert m["0"] == str(docid_unique[0])

    # companion sliced with the SAME keep
    comp = tmp_path / "companion.npz"
    save_synthetic_npz(comp, {k: dup_payload[k] for k in
                              ("docid", "documents", "doc_attnmask", "doc_imgmask")})
    out2 = tmp_path / "companion_unique.npz"
    dedup_companion_npz(comp, out2, keep, docid_unique, n_full=8)
    z2 = np.load(out2, allow_pickle=True)
    assert z2["documents"].shape[0] == 6
    info = sanity_check_unique(out2)
    assert info["docid"] == info["documents"] == info["map"] == 6

    # mismatched companion rejected
    with pytest.raises(ValueError):
        dedup_companion_npz(comp, out2, keep, docid_unique, n_full=7)


# ---------------------------------------------------------------------------
# make_questions
# ---------------------------------------------------------------------------

def test_parse_numbered_questions():
    text = """Here are the questions:
1. What is the revenue in 2023?
2) Who authored the report?
some noise
3. What fraction of the table is blue?
4. Extra question beyond limit"""
    qs = parse_numbered_questions(text, 3)
    assert qs == ["What is the revenue in 2023?", "Who authored the report?",
                  "What fraction of the table is blue?"]


def test_generate_questions_fake_and_resume(tmp_path):
    img_dir = tmp_path / "pages"
    img_dir.mkdir()
    for i in range(5):
        (img_dir / f"page_{i}.jpg").write_bytes(b"\xff\xd8fakejpg")
    out = tmp_path / "proxyq.json"
    res = generate_questions(img_dir, out, nq=4, backend="fake", save_every=2)
    assert len(res) == 5
    assert all(len(v["Question"]) == 4 and "error" not in v for v in res.values())

    # resume: inject a failed entry; only it should be regenerated
    data = json.loads(out.read_text())
    data["page_2"]["error"] = "boom"
    data["page_2"]["Question"] = []
    out.write_text(json.dumps(data))
    res2 = generate_questions(img_dir, out, nq=4, backend="fake")
    assert len(res2["page_2"]["Question"]) == 4 and "error" not in res2["page_2"]


# ---------------------------------------------------------------------------
# reporter + xlsx
# ---------------------------------------------------------------------------

def _fake_train_log(path: Path, ndcg5: float, r1: float):
    path.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        '[2026-01-01 00:00:00,000][INFO] {"step": 10, "eval/NDCG@5": 0.1}',
        '[2026-01-01 00:00:01,000][INFO] {"summary/latency": 1.0, '
        '"summary/best_recall": {"step": 5, "Recall@1": %s, "NDCG@5": %s}, '
        '"summary/best_ndcg5": {"step": 7, "Recall@1": %s, "NDCG@5": %s}, '
        '"note": "training finished"}' % (r1, ndcg5, r1, ndcg5),
    ]
    path.write_text("\n".join(lines))


def test_parse_train_log(tmp_path):
    log = tmp_path / "train.log"
    _fake_train_log(log, 0.81309, 0.7)
    got = parse_train_log(log)
    assert got["N@5"] == pytest.approx(81.309)
    assert got["R@1"] == pytest.approx(70.0)
    assert got["step"] == 7


def test_write_report(tmp_path):
    root = tmp_path / "results"
    _fake_train_log(root / "expA" / "mf5" / "tabfquad" / "train.log", 0.8, 0.7)
    _fake_train_log(root / "expA" / "mf5" / "docvqa" / "train.log", 0.6, 0.5)
    _fake_train_log(root / "expA" / "mf10" / "tabfquad" / "train.log", 0.75, 0.65)
    _fake_train_log(root / "expB" / "mf5" / "tabfquad" / "train.log", 0.9, 0.85)

    out = tmp_path / "summary.xlsx"
    sheets = write_report(root, out)
    assert set(sheets) == {"mf5", "mf10"}
    mf5 = sheets["mf5"]
    assert mf5[0][0] == "setting"
    assert "tabfquad_N@5" in mf5[0] and "avg_R@1" in mf5[0]
    rows = {r[0]: r for r in mf5[1:]}
    i_n5 = mf5[0].index("tabfquad_N@5")
    assert rows["expB"][i_n5] == pytest.approx(90.0)
    # avg over available datasets
    i_avg = mf5[0].index("avg_N@5")
    assert rows["expA"][i_avg] == pytest.approx(70.0)

    # xlsx is a structurally valid package with both sheets
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
        assert "xl/workbook.xml" in names
        assert "xl/worksheets/sheet1.xml" in names
        wb = zf.read("xl/workbook.xml").decode()
        assert "mf5" in wb and "mf10" in wb
        s1 = zf.read("xl/worksheets/sheet1.xml").decode()
        assert "setting" in s1
    # csv siblings
    assert out.with_suffix(".mf5.csv").exists()


def test_xlsx_escaping(tmp_path):
    out = tmp_path / "t.xlsx"
    write_xlsx(out, {"s&1": [["a<b", 1.5], [None, "x\"y"]]})
    with zipfile.ZipFile(out) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
        assert "a&lt;b" in sheet
        wb = zf.read("xl/workbook.xml").decode()
        assert "s&amp;1" in wb


def test_reference_reporter_can_parse_our_logs(tmp_path):
    """Cross-check: the reference's own regex parses our train.log lines."""
    import re as _re

    ref_re = _re.compile(r"(\{.*\"summary\/best_ndcg5\".*\})\s*$")
    log = tmp_path / "train.log"
    _fake_train_log(log, 0.5, 0.4)
    matched = None
    for line in reversed(log.read_text().splitlines()):
        m = ref_re.search(line.strip())
        if m:
            matched = json.loads(m.group(1))
            break
    assert matched and matched["summary/best_ndcg5"]["NDCG@5"] == 0.5


# ---------------------------------------------------------------------------
# pool_index
# ---------------------------------------------------------------------------

def test_pool_index_mean_and_kmeans(tmp_path):
    from evdr_tpu.tools.pool_index import build_pooled_index

    c = make_synthetic_corpus(n_docs=6, n_queries=4, dim=16, seed=2,
                              doc_len_range=(30, 50))
    src = tmp_path / "dump_all.npz"
    save_synthetic_npz(src, c)
    for method in ("mean", "kmeans"):
        out = tmp_path / method / "mf5" / "x.npz"
        build_pooled_index(src, out, mf=5, method=method)
        z = np.load(out, allow_pickle=True)
        docs = z["documents"]
        for i in range(6):
            n_valid = int((np.asarray(c["doc_attnmask"][i], bool)
                           & np.asarray(c["doc_imgmask"][i], bool)).sum())
            want_k = max(1, int(round(n_valid / 5)))
            assert docs[i].shape[0] == want_k, (method, i)
            assert np.isfinite(docs[i]).all()
        meta = z["meta"].item()
        assert meta["mf"] == 5 and meta["method"] == method


def test_pooled_init_trains(tmp_path):
    """pool_index output plugs directly into the trainer as the init index."""
    from evdr_tpu.tools.pool_index import build_pooled_index
    from evdr_tpu.data.registry import register_dataset
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training
    from evdr_tpu.data.synthetic import make_queries_for_corpus

    c = make_synthetic_corpus(n_docs=10, n_queries=8, dim=16, seed=3)
    save_synthetic_npz(tmp_path / "pooled_test_dump_all.npz", c)
    qp = make_queries_for_corpus(c, n_queries=24, seed=9)
    save_synthetic_npz(tmp_path / "pooled_test_query.npz", qp)
    build_pooled_index(tmp_path / "pooled_test_dump_all.npz",
                       tmp_path / "init" / "mf5" / "pooled_test.npz",
                       mf=5, method="kmeans")
    register_dataset("pooledfx", "pooled_test", mfs=(5,))
    cfg = TrainConfig(datasets=["pooledfx"], query_root=str(tmp_path),
                      teacher_root=str(tmp_path), init_root=str(tmp_path / "init"),
                      mfs=[5], out_root=str(tmp_path / "res"), loss="liscore",
                      max_steps=3, eval_every=3, print_every=0, q_batch=8,
                      k=4, chunk_p=8)
    results = run_training(cfg)
    assert "pooledfx/mf5" in results


# ---------------------------------------------------------------------------
# packed conversion
# ---------------------------------------------------------------------------

def test_convert_packed_roundtrip_and_training(tmp_path):
    from evdr_tpu.tools.convert_packed import (convert_payload_to_packed,
                                               is_packed, load_packed_payload)
    from evdr_tpu.data.npz_io import load_payload
    from evdr_tpu.data.packing import preprocess_docs, preprocess_queries
    from evdr_tpu.data.synthetic import make_queries_for_corpus, write_dataset_fixture
    from evdr_tpu.train.config import TrainConfig
    from evdr_tpu.train.harness import run_training

    root = tmp_path / "raw"
    root.mkdir()
    write_dataset_fixture(root, key="pkfx", n_docs=10, n_test_queries=8,
                          n_train_queries=24, dim=16, mfs=(5,), seed=4)

    # convert dump_all + query npz to packed; init stays interchange
    import numpy as np
    for name in ("pkfx_test_dump_all.npz", "pkfx_test_query.npz"):
        payload = load_payload(root / name)
        packed = convert_payload_to_packed(payload, length_multiple=8)
        np.savez(root / name, **packed)  # overwrite in place
        assert is_packed(root / name)
        rp = load_packed_payload(root / name)
        if "P_pad" in rp:
            assert rp["P_pad"].shape[1] % 8 == 0
            assert rp["docidx_2_docid"]["0"] == str(payload["docid"][0])

    cfg = TrainConfig(datasets=["pkfx"], query_root=str(root),
                      teacher_root=str(root), init_root=str(root / "S3E_init"),
                      mfs=[5], out_root=str(tmp_path / "res"), loss="liscore",
                      max_steps=3, eval_every=3, print_every=0, q_batch=8,
                      k=4, chunk_p=8)
    results = run_training(cfg)
    assert "pkfx/mf5" in results


def test_packed_values_match_interchange(tmp_path):
    from evdr_tpu.tools.convert_packed import convert_payload_to_packed
    from evdr_tpu.data.packing import preprocess_docs, preprocess_queries

    c = make_synthetic_corpus(n_docs=5, n_queries=4, dim=8, seed=6)
    packed = convert_payload_to_packed(c)
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"],
                                  c["doc_imgmask"])
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    np.testing.assert_array_equal(packed["P_pad"], P)
    np.testing.assert_array_equal(packed["pmask"], pmask)
    np.testing.assert_allclose(packed["Q_norm"], Q, rtol=1e-6)
    np.testing.assert_array_equal(packed["qmask"], qmask)


def test_packed_storage_dtypes(tmp_path):
    """bf16/int8-stored packed files roundtrip through npz + loader with
    bounded error and serve through RetrievalEngine.from_npz."""
    import ml_dtypes

    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.tools.convert_packed import (convert_payload_to_packed,
                                               is_packed, load_packed_payload)
    from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries

    c = make_synthetic_corpus(n_docs=12, n_queries=6, dim=16, seed=7)
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"],
                                  c["doc_imgmask"])
    Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    ref = np.asarray(maxsim_numpy(Q, Pn, qmask, pmask))

    for dtype, tol in (("bfloat16", 2e-2), ("int8", 3e-2)):
        packed = convert_payload_to_packed(c, dtype=dtype)
        path = tmp_path / f"dt_{dtype}.packed.npz"
        np.savez(path, **packed)
        assert is_packed(path)
        rp = load_packed_payload(path)
        assert rp["P_pad"].dtype == np.float32
        # int8 zeroes mask-invalid tokens (inert: consumers multiply by
        # pmask) — compare valid positions only
        err = np.abs(rp["P_pad"] - P) * pmask[..., None]
        assert np.max(err) < tol * max(1.0, np.max(np.abs(P)))
        if dtype == "bfloat16":
            with np.load(path) as z:
                assert z["P_pad_bf16"].dtype == np.uint16
                assert "P_pad" not in z.files
        else:
            with np.load(path) as z:
                assert z["P_codes"].dtype == np.int8
                assert "P_pad" not in z.files
            assert rp["P_codes"].dtype == np.int8
        # end-to-end: engine consumes the packed file directly
        eng = RetrievalEngine.from_npz(path, dtype="float32", impl="xla")
        sc = eng.score_all(Q, qmask)[:, :P.shape[0]]
        assert np.max(np.abs(sc - ref)) < 0.1
        top1_agree = np.mean(np.argmax(sc, 1) == np.argmax(ref, 1))
        assert top1_agree >= 0.8


# ---------------------------------------------------------------------------
# search CLI
# ---------------------------------------------------------------------------

def test_search_cli_trec_and_json(tmp_path, capsys):
    """evdr-search end-to-end: interchange index + query npz -> TREC run whose
    top-1 matches brute-force fp32 scoring; JSON format round-trips."""
    from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.tools.search import main as search_main

    c = make_synthetic_corpus(n_docs=10, n_queries=6, dim=16, seed=11)
    idx_p = tmp_path / "sfx_dump_all.npz"
    save_synthetic_npz(idx_p, c)

    out = tmp_path / "run.trec"
    search_main(["--index", str(idx_p), "--queries", str(idx_p),
                 "--k", "3", "--out", str(out), "--dtype", "float32",
                 "--impl", "xla"])
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 6 * 3
    # brute-force oracle
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"],
                                  c["doc_imgmask"])
    Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    ref = np.asarray(maxsim_numpy(Q, Pn, qmask, pmask))
    docids = [str(d) for d in c["docid"]]
    for qi in range(6):
        qk, q0, did, rank, score, tag = lines[qi * 3].split()
        assert (qk, q0, rank, tag) == (str(c["qid"][qi]), "Q0", "1", "evdr_tpu")
        assert did == docids[int(np.argmax(ref[qi]))]
        assert abs(float(score) - ref[qi].max()) < 1e-4

    # JSON format to stdout
    search_main(["--index", str(idx_p), "--queries", str(idx_p),
                 "--k", "2", "--format", "json", "--dtype", "float32",
                 "--impl", "xla"])
    cap = capsys.readouterr()
    res = json.loads(cap.out.strip())
    assert len(res) == 6 and all(len(v) == 2 for v in res.values())
    summary = json.loads(cap.err.strip().splitlines()[-1])
    assert summary["n_docs"] == 10 and summary["n_queries"] == 6


def test_eval_run_cli_matches_direct_metrics(tmp_path, capsys):
    """evdr-search -> evdr-eval reproduces the in-process evaluator's
    metrics for the same scores, for both npz and TREC qrels inputs."""
    from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
    from evdr_tpu.eval.metrics import compute_retrieval_metrics
    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.tools.eval_run import main as eval_main
    from evdr_tpu.tools.search import main as search_main

    c = make_synthetic_corpus(n_docs=12, n_queries=8, dim=16, seed=21)
    idx_p = tmp_path / "efx_dump_all.npz"
    save_synthetic_npz(idx_p, c)
    run_p = tmp_path / "run.trec"
    # k = n_docs so the run is deep enough for the cutoffs under test
    search_main(["--index", str(idx_p), "--queries", str(idx_p),
                 "--k", "12", "--out", str(run_p), "--dtype", "float32",
                 "--impl", "xla"])

    # npz qrels are query-string keyed; the run is qid keyed -> --queries
    # provides the remap (the reference's qsidx_2_query convention)
    eval_main(["--run", str(run_p), "--qrels", str(idx_p),
               "--queries", str(idx_p), "--k", "1", "5"])
    got = json.loads(capsys.readouterr().out)

    # oracle: brute-force scores -> direct metric computation
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"],
                                  c["doc_imgmask"])
    Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    sc = np.asarray(maxsim_numpy(Q, Pn, qmask, pmask))
    docids = [str(d) for d in c["docid"]]
    results = {str(c["qsidx_2_query"][qi]): {docids[di]: float(sc[qi, di])
                                             for di in range(12)}
               for qi in range(8)}
    want = compute_retrieval_metrics(c["relevant_docs"], results, k_values=[1, 5])
    assert want["NDCG"]["NDCG@5"] > 0.5  # sanity: eval is not vacuous
    assert got["NDCG"]["NDCG@5"] == pytest.approx(want["NDCG"]["NDCG@5"], abs=1e-4)
    assert got["Recall"]["Recall@1"] == pytest.approx(want["Recall"]["Recall@1"], abs=1e-4)
    assert got["n_queries"] == 8 and got["n_queries_missing_from_run"] == 0

    # TREC-format qrels (qid-keyed, whitespace-free) agree without a remap
    qr_p = tmp_path / "qrels.txt"
    qid_of = {str(s): str(i) for i, s in zip(c["qid"], c["qsidx_2_query"])}
    with open(qr_p, "w") as fh:
        for q, docs in c["relevant_docs"].items():
            for d, r in docs.items():
                fh.write(f"{qid_of[q]} 0 {d} {r}\n")
    eval_main(["--run", str(run_p), "--qrels", str(qr_p), "--k", "1", "5"])
    got2 = json.loads(capsys.readouterr().out)
    assert got2["NDCG"] == got["NDCG"] and got2["Recall"] == got["Recall"]


def test_http_server_search_and_health(tmp_path):
    """evdr-serve end-to-end on localhost: health check, ragged-query search
    whose top-1 matches the brute-force oracle, and input validation."""
    import threading
    import urllib.request

    from evdr_tpu.data.packing import l2_normalize, preprocess_docs, preprocess_queries
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.ops.maxsim import maxsim_numpy
    from evdr_tpu.tools.serve_http import make_server

    c = make_synthetic_corpus(n_docs=10, n_queries=5, dim=16, seed=31)
    eng = RetrievalEngine(dtype="float32", impl="xla")
    eng.build_from_ragged(c["documents"], c["doc_attnmask"], c["doc_imgmask"],
                          docids=c["docid"])
    srv = make_server(eng, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["n_docs"] == 10

        body = json.dumps({
            "queries": [np.asarray(q, np.float32).tolist() for q in c["query"]],
            "attnmask": [np.asarray(m, bool).tolist()
                         for m in c["query_attnmask"]],
            "k": 3,
        }).encode()
        req = urllib.request.Request(f"{base}/search", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        assert len(res["docids"]) == 5 and len(res["scores"][0]) == 3

        P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"],
                                      c["doc_imgmask"])
        Pn = np.asarray(l2_normalize(P * pmask[..., None].astype(np.float32)))
        Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
        ref = np.asarray(maxsim_numpy(Q, Pn, qmask, pmask))
        docids = [str(d) for d in c["docid"]]
        for qi in range(5):
            assert res["docids"][qi][0] == docids[int(np.argmax(ref[qi]))]

        # k beyond n_docs is clamped: no padded-index docids leak
        body_big_k = json.loads(body)
        body_big_k["k"] = 50
        req2 = urllib.request.Request(
            f"{base}/search", data=json.dumps(body_big_k).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2) as r:
            res2 = json.loads(r.read())
        assert len(res2["docids"][0]) == 10  # clamped to n_docs
        assert set(res2["docids"][0]) <= {str(d) for d in c["docid"]}

        # every 200 reply reports its dispatch-group size (observability
        # for tuning --batch_wait_ms)
        assert res["batched_with"] >= 1

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(f"{base}/search", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # k < 1 -> 400 BEFORE submission (a coalesced group dispatches at
        # max-k and slices per request, so k=-3 would silently return a
        # truncated 200)
        for bad_k in (0, -3):
            body_bad_k = json.loads(body)
            body_bad_k["k"] = bad_k
            reqk = urllib.request.Request(
                f"{base}/search", data=json.dumps(body_bad_k).encode(),
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(reqk)
                assert False, f"expected HTTP 400 for k={bad_k}"
            except urllib.error.HTTPError as e:
                assert e.code == 400 and "k must be" in json.loads(
                    e.read())["error"]

        # wrong query dim -> 400 BEFORE submission (a wrong-dim request
        # inside a coalesced group would fail the whole group)
        bad_dim = urllib.request.Request(
            f"{base}/search",
            data=json.dumps({"queries": [[[0.0] * 8] * 2]}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad_dim)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "dim" in json.loads(e.read())["error"]

        # /metrics: Prometheus text with consistent counters (2 successful
        # searches of 5 queries each so far, 4 client errors above)
        with urllib.request.urlopen(f"{base}/metrics") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            metrics = r.read().decode()
        vals = {ln.split(" ")[0]: ln.split(" ")[1]
                for ln in metrics.splitlines() if not ln.startswith("#")}
        assert vals["evdr_requests_total"] == "2"
        assert vals["evdr_queries_total"] == "10"
        assert vals['evdr_errors_total{class="4xx"}'] == "4"
        assert vals["evdr_request_latency_ms_count"] == "2"
        assert int(vals["evdr_dispatches_total"]) >= 2
        assert 'evdr_dispatch_group_size_bucket{le="+Inf"}' in metrics
    finally:
        srv.shutdown()
        srv.server_close()  # also stops the MicroBatcher dispatcher


def test_serve_bucket_queries_inert():
    """Batch bucketing pads with fully-masked query rows — scoring results
    for the real rows must be identical (ADVICE r2: shape buckets keep the
    serve jit cache warm)."""
    import jax.numpy as jnp

    from evdr_tpu.ops.maxsim import maxsim_xla
    from evdr_tpu.tools.serve_http import _batch_bucket, bucket_queries

    assert [_batch_bucket(n) for n in (1, 2, 3, 5, 8, 9, 33)] == \
        [1, 2, 4, 8, 8, 16, 64]
    rng = np.random.default_rng(0)
    Q = rng.normal(size=(5, 4, 16)).astype(np.float32)
    qm = rng.random((5, 4)) > 0.2
    P = rng.normal(size=(6, 8, 16)).astype(np.float32)
    pm = rng.random((6, 8)) > 0.2
    Qb, qmb = bucket_queries(Q, qm)
    assert Qb.shape[0] == 8 and not qmb[5:].any()
    sc = maxsim_xla(jnp.asarray(Qb), jnp.asarray(P), jnp.asarray(qmb),
                    jnp.asarray(pm), chunk_p=4)
    sc_ref = maxsim_xla(jnp.asarray(Q), jnp.asarray(P), jnp.asarray(qm),
                        jnp.asarray(pm), chunk_p=4)
    np.testing.assert_allclose(np.asarray(sc)[:5], np.asarray(sc_ref),
                               rtol=1e-6, atol=1e-6)
    # padded rows score exactly 0 (all tokens masked)
    assert np.all(np.asarray(sc)[5:] == 0.0)


def test_microbatcher_parity_under_concurrency():
    """Concurrent searches through the MicroBatcher return exactly what
    per-request engine.search_dense returns — coalescing (shared batch,
    max-k dispatch, per-request slicing) must be invisible to callers."""
    import threading

    from evdr_tpu.data.packing import preprocess_docs, preprocess_queries
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.tools.serve_http import MicroBatcher

    c = make_synthetic_corpus(n_docs=30, n_queries=12, dim=16, seed=7)
    eng = RetrievalEngine(dtype="float32", impl="xla")
    P, pmask, _ = preprocess_docs(c["documents"], c["doc_attnmask"],
                                  c["doc_imgmask"])
    eng.build(P, pmask)
    Q, qmask = preprocess_queries(c["query"], c["query_attnmask"])
    batcher = MicroBatcher(eng, wait_ms=30.0, max_batch=16)

    ks = [2, 3, 5, 3]
    slices = [(0, 3), (3, 6), (6, 9), (9, 12)]
    got = [None] * 4

    def worker(j):
        a, b = slices[j]
        got[j] = batcher.search_dense(Q[a:b], qmask[a:b], k=ks[j])

    threads = [threading.Thread(target=worker, args=(j,)) for j in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive()
    for j, (a, b) in enumerate(slices):
        rv, ri = eng.search_dense(Q[a:b], qmask[a:b], k=ks[j])
        np.testing.assert_array_equal(got[j][1], np.asarray(ri))
        np.testing.assert_allclose(got[j][0], np.asarray(rv),
                                   rtol=1e-6, atol=1e-6)
    batcher.close()
    assert not batcher._thread.is_alive()


def test_microbatcher_coalesces_and_groups_by_candidates():
    """Requests queued while a dispatch is in flight share the NEXT
    dispatch; requests with different n_candidates never share one (they
    compile different programs). Scatter offsets must line up."""
    import threading

    from evdr_tpu.tools.serve_http import MicroBatcher

    class FakeEngine:
        def __init__(self):
            self.calls = []
            self.release = threading.Event()
            self.entered = threading.Event()

        def search_dense(self, Q, qmask, k, n_candidates=None):
            self.calls.append((int(Q.shape[0]), n_candidates))
            if len(self.calls) == 1:  # hold the FIRST dispatch in flight
                self.entered.set()
                assert self.release.wait(timeout=30)
            # row-numbered indices expose wrong scatter offsets downstream
            idx = np.tile(np.arange(Q.shape[0])[:, None], (1, k))
            return np.zeros((Q.shape[0], k), np.float32), idx

    fake = FakeEngine()
    batcher = MicroBatcher(fake, wait_ms=0.0, max_batch=16)
    D, LQ = 8, 4
    q = np.zeros((1, LQ, D), np.float32)
    m = np.ones((1, LQ), bool)

    first = batcher.submit(q, m, k=2)
    assert fake.entered.wait(timeout=30)  # dispatcher is inside call #1
    exact = [batcher.submit(q, m, k=2) for _ in range(3)]
    pruned = [batcher.submit(q, m, k=2, n_candidates=5) for _ in range(2)]
    fake.release.set()
    for r in [first] + exact + pruned:
        assert r.done.wait(timeout=30) and r.err is None

    assert first.batched_with == 1
    assert all(r.batched_with == 3 for r in exact)
    assert all(r.batched_with == 2 for r in pruned)
    # three dispatches total; candidate settings never mixed
    assert [c[1] for c in fake.calls] == [None, None, 5]
    # scatter: request j of the exact group got row j of the shared batch
    for j, r in enumerate(exact):
        np.testing.assert_array_equal(r.idx, np.full((1, 2), j))
    batcher.close()


def test_trec_run_sanitizes_whitespace_qids(tmp_path):
    """Question-string qids (the ProxyQ/gt-docs convention) contain spaces;
    run lines must stay 6-field parseable and evdr-eval's --queries remap
    must key by the same sanitized form so metrics still align."""
    from evdr_tpu.tools.eval_run import read_trec_run
    from evdr_tpu.tools.search import trec_qid, write_trec_run

    qkeys = ["what is the total revenue in 2020", "plain"]
    run_path = tmp_path / "run.trec"
    with open(run_path, "w") as fh:
        write_trec_run(fh, qkeys, [["d1", "d2"], ["d1"]],
                       [[0.9, 0.5], [0.7]])
    results = read_trec_run(run_path)  # crashed pre-fix: float('revenue')
    assert set(results) == {trec_qid(qkeys[0]), "plain"}
    assert results[trec_qid(qkeys[0])]["d1"] == 0.9


def test_save_packed_npz_loads_through_engine(tmp_path):
    """save_packed_npz must write the pickle-free packed conventions:
    the old object-dtype docid made is_packed=True files that
    load_packed_payload (allow_pickle=False) rejected."""
    from evdr_tpu.data.npz_io import load_packed_npz, save_packed_npz
    from evdr_tpu.engine import RetrievalEngine
    from evdr_tpu.tools.convert_packed import is_packed

    rng = np.random.default_rng(0)
    P = rng.normal(size=(6, 4, 16)).astype(np.float32)
    pm = np.ones((6, 4), dtype=bool)
    pth = tmp_path / "idx.packed.npz"
    save_packed_npz(pth, docid=[f"page_{i}.jpg" for i in range(6)],
                    P_pad=P, pmask=pm, meta={"note": "t"})
    assert is_packed(pth)
    back = load_packed_npz(pth)
    assert back["meta"] == {"note": "t"}
    np.testing.assert_array_equal(back["P_pad"], P)
    eng = RetrievalEngine.from_npz(pth, impl="xla")  # crashed pre-fix
    assert eng.n_docs == 6


def test_kmeans_pool_identical_tokens_no_crash():
    """Pages with repeated patch embeddings (uniform regions) drove the
    kmeans++ distance distribution to all-zeros and rng.choice crashed."""
    from evdr_tpu.tools.pool_index import _kmeans_pool

    toks = np.ones((10, 8), dtype=np.float32)
    centers = _kmeans_pool(toks, mf=5)
    assert centers.shape == (2, 8)
    assert np.isfinite(centers).all()


def test_pooled_init_index_all_masked_doc_finite():
    """A doc whose tokens are ALL masked must pool to zeros, not NaN."""
    from evdr_tpu.data.synthetic import pooled_init_index

    payload = {
        "docid": np.array(["a", "b"], dtype=object),
        "documents": np.array(
            [np.ones((5, 8), np.float32), np.ones((4, 8), np.float32)],
            dtype=object),
        "doc_attnmask": np.array(
            [np.ones(5, bool), np.zeros(4, bool)], dtype=object),
        "doc_imgmask": np.array(
            [np.ones(5, bool), np.ones(4, bool)], dtype=object),
    }
    out = pooled_init_index(payload, mf=2)
    for d in out["documents"]:
        assert np.isfinite(np.asarray(d)).all()
