"""Unit tests for the training-data operator layer: dedup family,
similarity search, text analysis, multimodal plumbing, relational
helpers (SURVEY.md §2.3 X12 + the large-scale pipeline ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def docs_ds(texts, start_id=0):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_exact_dedup_picks_min_id(ray_session):
    from wprdc_etl_ray.functions.dedup import exact_dedup

    ds = docs_ds(["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"])
    out = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    assert out == [0, 1, 3]


def test_minhash_lsh_finds_near_dups_not_distinct(ray_session):
    from wprdc_etl_ray.functions.dedup import minhash_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    texts = [base, base + "tiny change", "completely different words entirely here now"]
    pairs = minhash_lsh_candidates(docs_ds(texts), concurrency=1).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_close_for_near_dups(ray_session):
    from wprdc_etl_ray.functions.dedup import simhash_signatures

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    ds = docs_ds([base, base + "iota", "unrelated totally different content words"])
    rows = {r["doc_id"]: r["simhash"] for r in simhash_signatures(ds, concurrency=1).take_all()}
    d01 = bin(rows[0] ^ rows[1]).count("1")
    d02 = bin(rows[0] ^ rows[2]).count("1")
    assert d01 < d02


def test_ngram_jaccard_verify():
    from wprdc_etl_ray.functions.dedup import ngram_jaccard_verify

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a b c d e f g h", "a b c d e f g x", "z z z z z"],
        }
    )
    cand = pd.DataFrame({"doc_a": [0, 0], "doc_b": [1, 2]})
    out = ngram_jaccard_verify(cand, docs, n=3, threshold=0.3)
    assert list(out["doc_b"]) == [1]
    assert 0.3 <= out["jaccard"][0] <= 1.0


def test_brute_force_topk_exact(ray_session):
    from wprdc_etl_ray.functions.similarity import brute_force_topk

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 8))
    mat[7] = mat[0] * 2.0  # same direction as row 0 -> cosine 1
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
            }
        )
    )
    out = brute_force_topk(ds, mat[0], k=3, exclude=0)
    assert out["vec_id"][0] == 7
    assert out["cosine"][0] >= 999_990  # micro-units, float32 storage jitter


def test_ivf_topk_recalls_exact_neighbor(ray_session):
    from wprdc_etl_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(4)
    mat = rng.normal(size=(300, 16))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
            }
        )
    )
    exact = brute_force_topk(ds, mat[5], k=1, exclude=5)
    approx = ivf_topk(ds, mat[5], k=5, n_cells=8, n_probe=4)
    assert exact["vec_id"][0] in set(approx["vec_id"])  # top-1 recalled


def test_token_stats_matches_manual(ray_session):
    from wprdc_etl_ray.functions.text import token_stats

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["  ab cd  efg "]})
    out = token_stats(t)
    assert out.column("n_tokens").to_pylist() == [3]
    # chars sans space = 7, tokens = 3 -> 7*1e6 // 3
    assert out.column("avg_token_len").to_pylist() == [7 * 1_000_000 // 3]


def test_lang_id_heuristic(ray_session):
    from wprdc_etl_ray.functions.text import lang_id

    ds = docs_ds(
        [
            "the cat and the dog sat in the house of the king",
            "der hund und die katze ist das haus",
            "xyzzy qwerty",
        ]
    )
    rows = {r["doc_id"]: r["lang_pred"] for r in lang_id(ds, concurrency=1).take_all()}
    assert rows[0] == "en"
    assert rows[1] == "de"
    assert rows[2] == "und"


def test_fingerprint_deterministic_and_discriminative():
    from wprdc_etl_ray.functions.text import fingerprint

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()), "text": ["hello world", "hello world", "other"]}
    )
    out = fingerprint(t)
    fps = out.column("fingerprint").to_pylist()
    assert fps[0] == fps[1] != fps[2]


def test_multimodal_stub_and_real_mode(ray_session):
    from wprdc_etl_ray.functions.multimodal import DecodeStub, multimodal_features

    ds = docs_ds(["abc", "defg"])
    rows = sorted(multimodal_features(ds, concurrency=1).take_all(), key=lambda r: r["doc_id"])
    assert rows[0]["n_bytes"] == 3 and rows[1]["n_bytes"] == 4
    import hashlib

    assert rows[0]["content_md5"] == hashlib.md5(b"abc").hexdigest()
    # real mode is a real PNG decoder now (tests/test_codecs.py): a
    # non-PNG payload fails with the codec's error, not a stub marker
    from wprdc_etl_ray.functions.codecs import CodecError

    with pytest.raises(CodecError):
        DecodeStub(mode="real")(pa.table({"doc_id": [0], "payload": [b"x"]}))


def test_argmax_per_key_ties_and_strings():
    from wprdc_etl_ray.functions.relational import argmax_per_key

    t = pa.table(
        {
            "k": ["a", "a", "b", "b", "b"],
            "ts": pa.array([1, 2, 5, 5, 4], pa.int64()),
            "id": pa.array([10, 11, 20, 21, 22], pa.int64()),
            "v": ["x1", "x2", "y1", "y2", "y3"],
        }
    )
    out = argmax_per_key(t, ["k"], ["ts", "id"])
    assert out.column("v").to_pylist() == ["x2", "y2"]  # tie at ts=5 -> higher id


def test_grouped_agg_matches_pandas(ray_session):
    from wprdc_etl_ray.functions.relational import grouped_agg

    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b", "c"], 100),
            "v": np.arange(300, dtype="float64"),
        }
    )
    ds = rd.from_pandas(df, override_num_blocks=7)  # multiple partial blocks
    out = (
        grouped_agg(
            ds,
            ["k"],
            [("v", "sum", "s"), ("", "count", "n"), ("v", "min", "lo"), ("v", "max", "hi")],
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    ref = (
        df.groupby("k")["v"].agg(s="sum", n="count", lo="min", hi="max").reset_index()
    )
    for c in ("s", "n", "lo", "hi"):
        assert list(out[c]) == list(ref[c]), c


def test_bucketed_group_map_covers_all_keys(ray_session):
    from wprdc_etl_ray.functions.relational import bucketed_group_map

    df = pd.DataFrame({"k": np.arange(1000) % 137, "v": np.arange(1000)})
    ds = rd.from_pandas(df, override_num_blocks=5)

    def agg(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("k", sort=False)["v"].sum().reset_index()

    out = bucketed_group_map(ds, ["k"], agg, num_buckets=16).to_pandas()
    ref = df.groupby("k")["v"].sum().reset_index()
    out = out.sort_values("k", ignore_index=True)
    assert list(out["k"]) == list(ref["k"]) and list(out["v"]) == list(ref["v"])


def test_hashing_kernels_match_python_reference():
    """Flat-array Horner/min-window/md5 kernels vs a plain Python loop."""
    import hashlib

    from wprdc_etl_ray.functions.hashing import (
        HORNER_B,
        horner_per_segment,
        md5_word_hashes,
        min_window_horner,
        split_flat,
    )

    M = 1 << 64

    def ref_horner(vals):
        acc = 0
        for x in vals:
            acc = (acc * HORNER_B + int(x)) % M
        return acc

    rng = np.random.default_rng(11)
    lens = np.array([0, 1, 3, 7, 8, 9, 20, 0, 2], dtype=np.int64)
    v = rng.integers(0, 2**63, size=int(lens.sum())).astype(np.uint64)
    got = horner_per_segment(v, lens)
    pos = 0
    for i, L in enumerate(lens):
        assert int(got[i]) == ref_horner(v[pos : pos + L]), i
        pos += L
    gmw = min_window_horner(v, lens, window=4)
    pos = 0
    for i, L in enumerate(lens):
        seg = v[pos : pos + L]
        pos += L
        if L == 0:
            assert gmw[i] == 0
            continue
        w = min(4, L)
        ref = min(ref_horner(seg[k : k + w]) for k in range(L - w + 1))
        assert int(gmw[i]) == ref, i

    words = np.array(["a", "bb", "a", "héllo"], dtype=object)
    wh = md5_word_hashes(words)
    for w, h in zip(words, wh):
        assert int(h) == int.from_bytes(
            hashlib.md5(w.encode("utf-8")).digest()[:8], "big"
        )
    flat, n = split_flat(pd.Series(["x y", "", "  ", "z"]))
    assert list(n) == [2, 0, 0, 1] and list(flat) == ["x", "y", "z"]


def test_simhash_matches_bitwise_reference():
    import hashlib

    from wprdc_etl_ray.functions.dedup import SimHasher

    def ref(t):
        ws = t.split()
        if not ws:
            return 0
        sig = 0
        for j in range(64):
            v = sum(
                1
                if (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") >> j) & 1
                else -1
                for w in ws
            )
            if v > 0:
                sig |= 1 << j
        return sig

    texts = ["hello world hello", "", "one", "a b c d e f g h i j"]
    out = SimHasher()(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    for i, t in enumerate(texts):
        assert out["simhash"][i] % (1 << 64) == ref(t), i


def test_exact_dedup_two_phase_matches_one_pass(ray_session):
    from wprdc_etl_ray.functions.dedup import exact_dedup

    texts = ["dup"] * 5 + [f"unique {i}" for i in range(50)] + ["dup2", "dup2"]
    ds = docs_ds(texts)
    two = sorted(r["doc_id"] for r in exact_dedup(ds, payload=False).take_all())
    one = sorted(r["doc_id"] for r in exact_dedup(ds, payload=True).take_all())
    assert two == one == [0] + list(range(5, 55)) + [55]


def test_exact_dedup_bloom_matches_exact(ray_session):
    from wprdc_etl_ray.functions.dedup import exact_dedup

    texts = ["dup"] * 5 + [f"unique {i}" for i in range(50)] + ["dup2", "dup2"]
    ds = docs_ds(texts)
    want = [0] + list(range(5, 55)) + [55]
    got = sorted(r["doc_id"] for r in exact_dedup(ds, repeated_filter="bloom").take_all())
    assert got == want
    # a deliberately saturated filter (300 repeated keys x 8 probes into
    # the 1024-bit minimum at 1 bit/key -> nearly everything is a false
    # positive) must STILL give the exact result: FPs only reroute rows
    # through phase 2, where the group-by-actual-text resolves them alone
    texts_fp = [f"dup {i}" for i in range(300)] * 2 + [f"unique {i}" for i in range(100)]
    ds_fp = docs_ds(texts_fp)
    want_fp = sorted(
        r["doc_id"] for r in exact_dedup(ds_fp, repeated_filter="exact").take_all()
    )
    got_fp = sorted(
        r["doc_id"]
        for r in exact_dedup(
            ds_fp, repeated_filter="bloom", bloom_bits_per_key=1
        ).take_all()
    )
    assert got_fp == want_fp == list(range(300)) + list(range(600, 700))


def test_exact_dedup_bloom_no_repeats(ray_session):
    from wprdc_etl_ray.functions.dedup import exact_dedup

    ds = docs_ds([f"unique {i}" for i in range(20)])
    got = sorted(r["doc_id"] for r in exact_dedup(ds, repeated_filter="bloom").take_all())
    assert got == list(range(20))


def test_asof_join_matches_merge_asof(ray_session):
    from wprdc_etl_ray.functions.relational import asof_join

    rng = np.random.default_rng(5)
    n = 400
    left = pd.DataFrame(
        {
            "id": np.arange(n, dtype="int64"),
            "k": rng.integers(0, 7, n),
            "t": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 60),
            "t": rng.integers(0, 1000, 60).astype("int64"),
            "v": rng.normal(size=60),
        }
    ).drop_duplicates(["k", "t"])
    out = (
        asof_join(rd.from_pandas(left, override_num_blocks=4),
                  rd.from_pandas(right, override_num_blocks=2),
                  on="t", by="k", num_buckets=8)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    ref = pd.merge_asof(
        left.sort_values("t", kind="stable"), right.sort_values("t", kind="stable"),
        on="t", by="k", direction="backward",
    ).sort_values("id", ignore_index=True)
    assert list(out["id"]) == list(ref["id"])
    assert out["v"].equals(ref["v"])


def test_simhash_near_dups_exact_recall(ray_session):
    from wprdc_etl_ray.functions.dedup import _POPCOUNT, simhash_near_dups, SimHasher

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    texts = [base, base + "lambda", base + "lambda mu", "totally different words here now"]
    ds = docs_ds(texts)
    out = simhash_near_dups(ds, max_hamming=7, bands=8).to_pandas()
    got = {(a, b) for a, b in zip(out["doc_a"], out["doc_b"])}
    # brute-force reference
    sigs = SimHasher()(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    sg = sigs["simhash"].to_numpy().astype(np.uint64)
    exp = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            hd = int(_POPCOUNT[np.array([sg[i] ^ sg[j]], np.uint64).view(np.uint8)].sum())
            if hd <= 7:
                exp.add((i, j))
    assert got == exp and len(got) > 0
    assert (0, 3) not in got and (1, 3) not in got


def test_bpe_token_stats():
    from wprdc_etl_ray.functions.text import bpe_token_stats

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()), "text": ["ab12 cd, x!", None]}
    )
    out = bpe_token_stats(t)
    # tokens: ab, 12, cd, ',', x, '!'
    assert out.column("n_bpe_tokens").to_pylist() == [6, 0]
    assert out.column("n_alpha_tokens").to_pylist() == [3, 0]
    assert out.column("n_numeric_tokens").to_pylist() == [1, 0]
    assert out.column("n_other_tokens").to_pylist() == [2, 0]


def test_topk_per_key_distributed(ray_session):
    from wprdc_etl_ray.functions.relational import topk_per_key

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 500),
            "v": rng.integers(0, 50, 500).astype("int64"),
            "id": np.arange(500, dtype="int64"),
        }
    )
    out = (
        topk_per_key(
            rd.from_pandas(df, override_num_blocks=6),
            ["k"], ["v", "id"], k=3, descending=[True, False],
        )
        .to_pandas()
        .sort_values(["k", "v", "id"], ascending=[True, False, True], ignore_index=True)
    )
    ref = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="stable")
        .groupby("k", sort=False)
        .head(3)
        .sort_values(["k", "v", "id"], ascending=[True, False, True], ignore_index=True)
    )
    assert out.equals(ref)


@pytest.mark.parametrize("broadcast", [True, False])
def test_connected_components_matches_union_find(ray_session, broadcast):
    from wprdc_etl_ray.functions.graph import connected_components

    rng = np.random.default_rng(13)
    # the join path pays ~2s of actor spawn per Dataset.join (4 joins x
    # rounds) - keep its graph small; the broadcast path gets the big one
    n_nodes, n_edges = (120, 150) if broadcast else (24, 20)
    edges = pd.DataFrame(
        {
            "doc_a": rng.integers(0, n_nodes, n_edges).astype("int64"),
            "doc_b": rng.integers(0, n_nodes, n_edges).astype("int64"),
        }
    )
    out = (
        connected_components(
            rd.from_pandas(edges, override_num_blocks=3),
            broadcast=broadcast,
            # join-path aggregator actors need CPU slots: keep
            # num_buckets (= join num_partitions) below the session CPUs
            num_buckets=4 if broadcast else 2,
        )
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )

    # union-find reference
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ref = {n: find(n) for n in parent}
    got = dict(zip(out["node"], out["comp"]))
    # same node set, and comp = min node of the union-find component
    comp_min: dict[int, int] = {}
    for n, r in ref.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    assert set(got) == set(ref)
    for n, r in ref.items():
        assert got[n] == comp_min[r], n


def test_blocked_near_dups_empty_result(ray_session):
    """No pair meets the threshold -> empty Dataset, no crash (the
    empty-bucket path of grouped_pandas_map)."""
    from wprdc_etl_ray.functions.similarity import blocked_near_dup_pairs

    rng = np.random.default_rng(21)
    mat = rng.normal(size=(40, 16))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = blocked_near_dup_pairs(ds, threshold=0.9999, n_blocks=3)
    assert out.count() == 0


def test_ivf_query_batch_matches_per_query(ray_session, tmp_path):
    """Batch path == per-query path over the same persisted index, and
    its candidates equal an exact numpy scan of the probed cells."""
    from wprdc_etl_ray.functions.similarity import IvfIndex

    rng = np.random.default_rng(6)
    mat = rng.normal(size=(400, 16))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(400), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    idx = IvfIndex.build(ds, str(tmp_path / "ivf"), n_cells=8)
    queries = mat[[3, 77, 200]]
    batch = idx.query_batch(queries, k=4, n_probe=3)
    for qid, qv in enumerate(queries):
        single = idx.query(qv, k=4, n_probe=3)
        got = batch[batch["qid"] == qid].reset_index(drop=True)
        assert list(got["vec_id"]) == list(single["vec_id"]), qid
        assert list(got["cosine"]) == list(single["cosine"]), qid


def test_ivf_query_batch_1000_queries_distributed_merge(ray_session, tmp_path):
    """A 1000-query batch through the distributed topk_per_key merge:
    every query gets exactly k rows, each row's cosine is within the
    probed cells' exact top-k, and a spot-check of queries that ARE
    corpus vectors finds themselves at cosine 1.0 first."""
    from wprdc_etl_ray.functions.similarity import IvfIndex

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(600, 12))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(600), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    idx = IvfIndex.build(ds, str(tmp_path / "ivf1k"), n_cells=8)
    qidx = rng.integers(0, 600, size=1000)
    out = idx.query_batch(mat[qidx], k=3, n_probe=3, as_dataset=True).to_pandas()
    sizes = out.groupby("qid").size()
    assert len(sizes) == 1000 and (sizes == 3).all()
    # self-match: each query vector is in the corpus; its own cell is
    # always its nearest centroid, so rank-1 must be itself (or an
    # exact duplicate) at cosine ~1.0
    top = out.sort_values(["qid", "cosine", "vec_id"], ascending=[True, False, True])
    first = top.groupby("qid", sort=True).head(1).reset_index(drop=True)
    assert (first["cosine"] >= 999_990).all()


def test_ivf_build_resumes_completed_cells(ray_session, tmp_path):
    """A build over a half-written index dir (simulated crash: cells
    written + marked, no centroids.json) skips the completed cells and
    commits; the reopened index answers identically to a fresh one."""
    from wprdc_etl_ray.functions.similarity import IvfIndex
    from wprdc_etl_ray.sources.sinks import completed_partitions

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(200, 8))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    import os
    import shutil

    fresh_dir = str(tmp_path / "fresh")
    idx = IvfIndex.build(ds, fresh_dir, n_cells=4)
    want = idx.query(mat[7], k=5, n_probe=2)

    # simulate crash-after-cells-before-commit, then resume
    crash_dir = str(tmp_path / "crashed")
    shutil.copytree(fresh_dir, crash_dir)
    os.unlink(os.path.join(crash_dir, "centroids.json"))
    assert not IvfIndex.is_complete(crash_dir)
    done_before = completed_partitions(os.path.join(crash_dir, "cells"))
    assert done_before  # cells really were marked
    idx2 = IvfIndex.build(ds, crash_dir, n_cells=4)
    assert IvfIndex.is_complete(crash_dir)
    got = idx2.query(mat[7], k=5, n_probe=2)
    assert list(got["vec_id"]) == list(want["vec_id"])
    assert list(got["cosine"]) == list(want["cosine"])


def test_multimodal_pipeline_chain(ray_session):
    from wprdc_etl_ray.functions.multimodal import ImageDecodeStub, multimodal_pipeline

    texts = ["abc", "", "x" * 300, "你好世界"]
    rows = sorted(
        multimodal_pipeline(docs_ds(texts), concurrency=1).take_all(),
        key=lambda r: r["doc_id"],
    )
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        first = b[0] if b else 0
        w, h = 16 + first % 240, 16 + len(b) % 240
        assert rows[i]["width"] == w and rows[i]["height"] == h, i
        long = max(w, h)
        ow = max(1, (w * 64) // long) if long > 64 else w
        oh = max(1, (h * 64) // long) if long > 64 else h
        assert rows[i]["out_width"] == ow and rows[i]["out_height"] == oh, i
        assert rows[i]["n_frames"] == 1 + len(b) // 16
        assert rows[i]["sampled_frames"] == min(4, 1 + len(b) // 16)
    import pytest as _pytest

    from wprdc_etl_ray.functions.codecs import CodecError

    with _pytest.raises(CodecError):  # real mode = real PNG decode now
        ImageDecodeStub(mode="real")(
            pa.table({"doc_id": [0], "payload": [b"x"]})
        )


def test_cosine_lsh_high_recall_on_near_dups(ray_session):
    """Near-identical vectors (cosine ~1) collide in every band with
    probability ~1 -> LSH must recover them; random pairs are mostly
    pruned (the sub-quadratic point)."""
    from wprdc_etl_ray.functions.similarity import cosine_lsh_near_dups

    rng = np.random.default_rng(17)
    base = rng.normal(size=(30, 32))
    dups = base[:10] + rng.normal(scale=1e-3, size=(10, 32))  # 10 near-dup pairs
    mat = np.vstack([base, dups])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = cosine_lsh_near_dups(ds, threshold=0.99).to_pandas()
    got = {(a, b) for a, b in zip(out["vec_a"], out["vec_b"])}
    assert {(i, 30 + i) for i in range(10)} <= got


def test_connected_components_empty_edges(ray_session):
    from wprdc_etl_ray.functions.graph import connected_components

    edges = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64")})
    out = connected_components(rd.from_pandas(edges))
    assert out.count() == 0


def test_feature_hash_embed_end_to_end_near_dups(ray_session):
    """documents -> hashing-trick embeddings -> exact cosine near-dup
    join recovers textual near-duplicates (the model-free closure of the
    embed->ANN pipeline)."""
    from wprdc_etl_ray.functions.embed import feature_hash_embed
    from wprdc_etl_ray.functions.similarity import blocked_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    texts = [base, base + "slightly changed", "completely different content here now",
             "another unrelated bag of words entirely"]
    emb = feature_hash_embed(docs_ds(texts)).map_batches(
        lambda b: pd.DataFrame(
            {"vec_id": b["doc_id"], "embedding": [list(map(float, v)) for v in b["embedding"]]}
        ),
        batch_format="pandas",
    )
    pairs = blocked_near_dup_pairs(emb, threshold=0.8, n_blocks=2).to_pandas()
    got = {(a, b) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    assert (0, 1) in got
    assert (0, 2) not in got and (2, 3) not in got


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions(ray_session, direction):
    from wprdc_etl_ray.functions.relational import asof_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "id": np.arange(200, dtype="int64"),
            "k": rng.integers(0, 5, 200),
            "t": rng.integers(0, 500, 200).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 40),
            "t": rng.integers(0, 500, 40).astype("int64"),
            "v": rng.normal(size=40),
        }
    ).drop_duplicates(["k", "t"])
    out = (
        asof_join(
            rd.from_pandas(left, override_num_blocks=3),
            rd.from_pandas(right, override_num_blocks=2),
            on="t", by="k", num_buckets=4, direction=direction,
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    ref = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t", by="k", direction=direction,
    ).sort_values("id", ignore_index=True)
    assert out["v"].equals(ref["v"])



def test_direct_exchange_equals_sort_path_random(ray_session):
    """The warm-pool direct hash exchange and Ray's sort-based groupby
    must agree with a pandas reference on random keyed data (several
    cardinalities incl. nulls in the key)."""
    from wprdc_etl_ray.functions.relational import bucketed_group_map

    rng = np.random.default_rng(31)
    for card, n in ((3, 200), (97, 1000), (997, 1500)):
        k = rng.integers(0, card, n).astype("float64")
        k[rng.random(n) < 0.02] = np.nan  # null keys co-locate too
        df = pd.DataFrame({"k": k, "v": rng.integers(0, 1000, n).astype("int64")})
        ds = rd.from_pandas(df, override_num_blocks=4)

        def agg(bucket: pd.DataFrame) -> pd.DataFrame:
            return bucket.groupby("k", sort=False, dropna=False)["v"].sum().reset_index()

        for exchange in ("direct", "sort"):
            out = (
                bucketed_group_map(ds, ["k"], agg, num_buckets=8, exchange=exchange)
                .to_pandas()
                .sort_values("k", ignore_index=True, na_position="last")
            )
            ref = (
                df.groupby("k", dropna=False)["v"].sum().reset_index()
                .sort_values("k", ignore_index=True, na_position="last")
            )
            assert len(out) == len(ref), (card, exchange)
            assert out["v"].equals(ref["v"]), (card, exchange)


def test_streaming_dedup_across_datasets(ray_session):
    from wprdc_etl_ray.functions.dedup import StreamingDeduper

    d = StreamingDeduper(num_actors=3)
    try:
        a = d.apply(docs_ds(["x", "y", "x", "z"])).to_pandas()
        assert sorted(a["text"]) == ["x", "y", "z"]
        # a LATER dataset: previously-seen texts are dropped too
        b = d.apply(docs_ds(["x", "w", "z", "w"], start_id=100)).to_pandas()
        assert sorted(b["text"]) == ["w"]
        assert d.unique_count() == 4
    finally:
        d.shutdown()


def test_corpus_freq_join_matches_broadcast(ray_session):
    from wprdc_etl_ray.functions.text import corpus_freq_score

    texts = ["the cat sat", "the the the", "", "dog", "the dog ran far away"]
    ds = docs_ds(texts)
    want = (
        corpus_freq_score(ds, vocab="broadcast").to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    got = (
        corpus_freq_score(ds, vocab="join").to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_tokens": "int64", "freq_score": "int64"}),
        want.astype({"n_tokens": "int64", "freq_score": "int64"}),
    )


def test_corpus_freq_pruned_understates_by_tail_mass(ray_session):
    from wprdc_etl_ray.functions.text import corpus_freq_score

    # 'the' (4x) dominates; with top_k=1 every other token scores 0
    texts = ["the rare", "the the the", "unique"]
    ds = docs_ds(texts)
    got = (
        corpus_freq_score(ds, vocab="pruned", top_k=1).to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc0: (4 + 0)*1e6 // 2 ; doc1: (4*3)*1e6 // 3 ; doc2: 0
    assert list(got["freq_score"]) == [2_000_000, 4_000_000, 0]
    exact = (
        corpus_freq_score(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert (got["freq_score"] <= exact["freq_score"]).all()


def test_minhash_verify_distributed_equals_broadcast(ray_session):
    """pairs_broadcast_cap=0 forces the join-based distributed verify;
    its verified pairs must equal the broadcast path's exactly."""
    from wprdc_etl_ray.functions.dedup import minhash_near_dups

    base = "the quick brown fox jumps over the lazy dog and keeps running onward " * 3
    texts = [base, base + "tiny change", base + "other small edit",
             "a completely different document with its own words here"] * 5
    ds = docs_ds(texts)

    def norm(out):
        return out.to_pandas().sort_values(
            ["doc_a", "doc_b"], ignore_index=True
        )

    broad = norm(minhash_near_dups(ds))
    dist = norm(minhash_near_dups(ds, pairs_broadcast_cap=0))
    pd.testing.assert_frame_equal(dist, broad)
    assert len(broad) > 0


def _brute_jaccard_pairs(texts, n=3, t_micro=800_000):
    from wprdc_etl_ray.functions.dedup import _gram_set

    grams = {i: _gram_set(t, n) for i, t in enumerate(texts)}
    rows = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(grams[a] & grams[b])
            uni = len(grams[a] | grams[b]) or 1
            jm = (inter * 2_000_000 + uni) // (2 * uni)
            if jm >= t_micro:
                rows.append((a, b, jm))
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
        .astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "int64"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def test_ngram_jaccard_prefix_filter_matches_bruteforce(ray_session):
    """Prefix filtering guarantees recall (no LSH luck): output must
    EQUAL exact all-pairs Jaccard on a corpus with exact dups, near
    dups, short docs and empty docs."""
    from wprdc_etl_ray.functions.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 12))) for _ in range(80)]
    texts += [texts[0], texts[1] + " extra", "", "", "a b"]
    exp = _brute_jaccard_pairs(texts)
    got = (
        ngram_jaccard_pairs(docs_ds(texts), order="hash")
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert len(exp) > 0


def test_ngram_jaccard_df_order_matches_hash_order(ray_session):
    """Any fixed global shingle order is correct — the df-ascending
    order (extra count pass + join) must give identical pairs."""
    from wprdc_etl_ray.functions.dedup import ngram_jaccard_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    texts = [base, base + "lambda", base + "mu nu",
             "totally different words in this one document here now"] * 3 + ["", "x y"]
    a = (
        ngram_jaccard_pairs(docs_ds(texts), order="hash")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    b = (
        ngram_jaccard_pairs(docs_ds(texts), order="df")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, _brute_jaccard_pairs(texts))


def test_ngram_jaccard_threshold_one_keeps_exact_dups(ray_session):
    """t=1.0 -> prefix length 1 (the single smallest shingle); exact
    duplicates must still pair up, strict near-dups must not."""
    from wprdc_etl_ray.functions.dedup import ngram_jaccard_pairs

    texts = ["one two three four five", "one two three four five",
             "one two three four five six", "unrelated doc entirely"]
    got = (
        ngram_jaccard_pairs(docs_ds(texts), threshold_micro=1_000_000)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert got[["doc_a", "doc_b"]].values.tolist() == [[0, 1]]
    assert got["jaccard"].tolist() == [1_000_000]


def test_hash_sample_deterministic_and_joinable(ray_session):
    from wprdc_etl_ray.functions.sampling import hash_sample, key_hash_u64, sample_threshold

    texts = [f"doc number {i}" for i in range(400)]
    ds = docs_ds(texts)
    a = sorted(r["doc_id"] for r in hash_sample(ds, 0.3).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(ds, 0.3).take_all())
    assert a == b  # rerun-stable
    thr = sample_threshold(0.3)
    exp = [i for i in range(400) if int(key_hash_u64(np.array([i]))[0]) < thr]
    assert a == exp
    # a 0.1 sample is a SUBSET of the 0.3 sample (nested thresholds)
    small = set(r["doc_id"] for r in hash_sample(ds, 0.1).take_all())
    assert small <= set(a)
    assert 0 < len(small) < len(a) < 400


def test_stratified_split_exact_quotas(ray_session):
    from wprdc_etl_ray.functions.sampling import stratified_split

    rng = np.random.default_rng(3)
    n = 500
    src = rng.choice(["web", "books", "code"], n, p=[0.6, 0.3, 0.1])
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(src, pa.string()),
    })
    out = stratified_split(rd.from_arrow(tbl), by="source", val_frac=0.25).to_pandas()
    assert len(out) == n and set(out["doc_id"]) == set(range(n))
    for s, grp in out.groupby("source"):
        n_s = len(grp)
        assert (grp["split"] == "val").sum() == int(np.floor(0.25 * n_s))
    # deterministic
    out2 = stratified_split(rd.from_arrow(tbl), by="source", val_frac=0.25).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_ordered_prefix_sum_matches_pandas(ray_session):
    from wprdc_etl_ray.functions.pack import ordered_prefix_sum

    rng = np.random.default_rng(11)
    n = 3000
    keys = [f"k{int(i):06d}" for i in rng.permutation(n)]  # shuffled order
    vals = rng.integers(0, 500, n)
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    exp = (
        pd.DataFrame({"k": keys, "v": vals})
        .sort_values("k")
        .assign(pre_sum=lambda d: d["v"].cumsum() - d["v"])
    )
    # boundary-independence: any num_ranges gives the same scan
    for nr in (1, 7, 64):
        got = (
            ordered_prefix_sum(rd.from_arrow(tbl), "k", "v", num_ranges=nr)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == exp["k"].tolist()
        assert got["pre_sum"].tolist() == exp["pre_sum"].tolist()
        assert got["v"].tolist() == exp["v"].tolist()


def test_ordered_prefix_sum_numeric_keys(ray_session):
    from wprdc_etl_ray.functions.pack import ordered_prefix_sum

    # int keys must order NUMERICALLY (2 < 10), not lexically
    keys = [10, 2, 33, 7, 100, 1]
    vals = [5, 3, 2, 1, 4, 9]
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    got = (
        ordered_prefix_sum(rd.from_arrow(tbl), "k", "v", num_ranges=3)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = (
        pd.DataFrame({"k": keys, "v": vals}).sort_values("k")
        .assign(pre_sum=lambda d: d["v"].cumsum() - d["v"]).reset_index(drop=True)
    )
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["pre_sum"].tolist() == exp["pre_sum"].tolist()


def test_seq_pack_concat_then_chunk(ray_session):
    from wprdc_etl_ray.functions.pack import seq_pack

    # doc i has exactly i+1 whitespace tokens
    texts = [" ".join(["w"] * (i + 1)) for i in range(50)]
    got = (
        seq_pack(docs_ds(texts), budget=20, num_ranges=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    n_tok = np.arange(1, 51)
    pre = np.cumsum(n_tok) - n_tok
    assert got["n_tokens"].tolist() == n_tok.tolist()
    assert got["pre_tokens"].tolist() == pre.tolist()
    assert got["bin"].tolist() == (pre // 20).tolist()
    # bins start at 0 and never decrease in corpus order (a doc longer
    # than the budget legitimately SKIPS bins — they fall inside it)
    bins = got["bin"].to_numpy()
    assert bins[0] == 0 and (np.diff(bins) >= 0).all()


def test_shuffle_rank_is_permutation(ray_session):
    from wprdc_etl_ray.functions.pack import shuffle_rank
    from wprdc_etl_ray.functions.sampling import key_hash_u64

    texts = ["x"] * 300
    got = (
        shuffle_rank(docs_ds(texts), num_ranges=5)
        .to_pandas().sort_values("pos").reset_index(drop=True)
    )
    # pos is exactly 0..n-1 and orders ids by their md5 hash
    assert got["pos"].tolist() == list(range(300))
    h = key_hash_u64(got["doc_id"].to_numpy())
    assert (np.diff(h.astype(np.uint64)) > 0).all()
    # rerun-stable
    got2 = shuffle_rank(docs_ds(texts), num_ranges=5).to_pandas()
    assert dict(zip(got2["doc_id"], got2["pos"])) == dict(
        zip(got["doc_id"], got["pos"])
    )


def test_cap_per_key_nested_and_capped(ray_session):
    from wprdc_etl_ray.functions.sampling import cap_per_key

    n = 400
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
    })
    small = cap_per_key(rd.from_arrow(tbl), by="source", cap=7).to_pandas()
    big = cap_per_key(rd.from_arrow(tbl), by="source", cap=20).to_pandas()
    assert (small.groupby("source").size() == 7).all()
    assert (big.groupby("source").size() == 20).all()
    # nested: the cap-7 picks are a subset of the cap-20 picks
    assert set(small["doc_id"]) <= set(big["doc_id"])


def test_mixture_sample_weights(ray_session):
    from wprdc_etl_ray.functions.sampling import hash_sample, mixture_sample

    n = 900
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
    })
    ds = rd.from_arrow(tbl)
    out = mixture_sample(
        ds, {"s0": 1.0, "s1": 0.0}, by="source", default=0.4
    ).to_pandas()
    by = out.groupby("source").size()
    assert by.get("s0", 0) == 300      # weight 1.0 keeps all
    assert "s1" not in by.index        # weight 0.0 drops all
    assert 0 < by.get("s2", 0) < 300   # default samples some
    # composability: s2's kept set == global hash_sample(0.4) ∩ s2
    glob = set(r["doc_id"] for r in hash_sample(ds, 0.4).take_all())
    assert set(out[out["source"] == "s2"]["doc_id"]) == {
        i for i in glob if i % 3 == 2
    }


def test_clean_text_redacts_and_normalizes():
    from wprdc_etl_ray.functions.text import clean_text

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [
            "Contact John.Doe+x@Example.COM  or  555-123-4567 today",
            "server at 10.0.0.1 card 4111111111111111\n\nEND",
            None,
        ],
    })
    out = clean_text(t)
    assert out.column("clean").to_pylist() == [
        "contact <email> or <phone> today",
        "server at <ip> card <longnum> end",
        "",
    ]
    assert out.column("n_redactions").to_pylist() == [2, 2, 0]


def test_exact_quantiles_dup_heavy(ray_session):
    from wprdc_etl_ray.functions.pack import exact_quantiles

    rng = np.random.default_rng(5)
    v = rng.integers(0, 40, 10_000)  # heavy duplication: 40 distinct
    ds = rd.from_arrow(pa.table({"v": pa.array(v, pa.int64())}))
    qs = [0.25, 0.5, 0.75, 0.875]
    got = exact_quantiles(ds, "v", qs, num_ranges=4)
    s = np.sort(v)
    exp = [int(s[max(0, int(np.ceil(q * len(v))) - 1)]) for q in qs]
    assert got.column("q").to_pylist() == qs
    assert got.column("value").to_pylist() == exp


def test_rolling_per_key_matches_pandas(ray_session):
    from wprdc_etl_ray.functions.relational import rolling_per_key

    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n),
        "o": rng.permutation(n),
        "v": rng.integers(-50, 50, n),
    })
    got = (
        rolling_per_key(rd.from_pandas(df, override_num_blocks=4),
                        ["k"], ["o"], "v", window=3)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    ref["roll_sum"] = (
        ref.groupby("k", sort=False)["v"].rolling(3, min_periods=1).sum()
        .to_numpy().astype(np.int64)
    )
    assert got["roll_sum"].tolist() == ref["roll_sum"].tolist()


def test_repetition_stats_exact_fractions(ray_session):
    from wprdc_etl_ray.functions.text import repetition_stats

    # doc0: 4 tokens, 3 distinct ("a" x2), 3 2-grams all distinct
    # doc1: all same token -> max repetition on both axes
    # doc2: empty; doc3: single token
    ds = docs_ds(["a b a c", "x x x x x", "", "solo"])
    got = ds.map_batches(repetition_stats, batch_format="pandas").to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == [4, 5, 0, 1]
    assert got["dup_word_ratio"].tolist() == [
        (4 - 3) * 1_000_000 // 4, (5 - 1) * 1_000_000 // 5, 0, 0]
    assert got["top_word_ratio"].tolist() == [
        2 * 1_000_000 // 4, 1_000_000, 0, 1_000_000]
    # doc0 2-grams: "a b","b a","a c" distinct; doc1: "x x" x4 -> 3 dup of 4
    assert got["dup_2gram_ratio"].tolist() == [0, 3 * 1_000_000 // 4, 0, 0]


def test_repetition_stats_batch_composition_independent(ray_session):
    from wprdc_etl_ray.functions.text import repetition_stats

    texts = ["a b a c", "", "x x y", "one", "", "p q p q p"]
    one = docs_ds(texts).map_batches(
        repetition_stats, batch_format="pandas", batch_size=100).to_pandas()
    split = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3).map_batches(
        repetition_stats, batch_format="pandas", batch_size=1).to_pandas()
    a = one.sort_values("doc_id").reset_index(drop=True)
    b = split.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_decontaminate_flags_overlap_only(ray_session):
    from wprdc_etl_ray.functions.dedup import decontaminate

    ev = docs_ds(["the quick brown fox jumps over the lazy dog"], start_id=100)
    train = docs_ds([
        "completely unrelated words in this document here today",
        "prefix text the quick brown fox jumps over something else",  # shares 5-grams
        "short doc",  # < 5 words -> whole-doc gram, no overlap
    ])
    got = decontaminate(train, ev, n=5).to_pandas().sort_values("doc_id")
    assert got["contaminated"].tolist() == [0, 1, 0]
    # doc1 shares exactly the 5-grams inside "the quick brown fox jumps over":
    # "the quick brown fox jumps" and "quick brown fox jumps over"
    assert got["n_overlap"].tolist() == [0, 2, 0]


def test_decontaminate_bloom_superset_of_exact(ray_session):
    from wprdc_etl_ray.functions.dedup import decontaminate

    ev = docs_ds([f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4} tok{i+5}" for i in range(20)],
                 start_id=1000)
    train = docs_ds(
        [f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4} extra" for i in range(10)]
        + ["nothing shared here at all whatsoever in any way"]
    )
    exact = decontaminate(train, ev, n=5).to_pandas().sort_values("doc_id")
    bloom = decontaminate(train, ev, n=5, bloom=True).to_pandas().sort_values("doc_id")
    # bloom may over-flag (FPs) but never under-flag
    assert (bloom["n_overlap"].to_numpy() >= exact["n_overlap"].to_numpy()).all()
    assert exact["contaminated"].tolist() == [1] * 10 + [0]


def test_tfidf_top_term_prefers_rare_terms(ray_session):
    from wprdc_etl_ray.functions.text import tfidf_top_term

    # "common" is in every doc (idf = N/3 each); each doc also has a
    # unique term with df=1 -> idf = N -> wins despite equal tf
    ds = docs_ds(["common alpha", "common beta", "common gamma", ""])
    got = tfidf_top_term(ds).to_pandas().sort_values("doc_id")
    assert got["top_term"].tolist() == ["alpha", "beta", "gamma", ""]
    assert got["tfidf_score"].tolist() == [4_000_000, 4_000_000, 4_000_000, 0]


def test_chunk_docs_overlap_and_tail(ray_session):
    from wprdc_etl_ray.functions.pack import chunk_docs

    # 10 tokens, max 4, overlap 2 -> stride 2 -> starts 0,2,4,6,8
    words = [f"w{i}" for i in range(10)]
    ds = docs_ds([" ".join(words), "", "a b"])
    got = chunk_docs(ds, max_tokens=4, overlap=2).to_pandas()
    d0 = got[got.doc_id == 0].sort_values("chunk_idx")
    assert d0["chunk_text"].tolist() == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9", "w8 w9"]
    assert d0["n_chunk_tokens"].tolist() == [4, 4, 4, 4, 2]
    assert (got.doc_id == 1).sum() == 0  # empty doc -> no chunks
    d2 = got[got.doc_id == 2]
    assert d2["chunk_text"].tolist() == ["a b"]


def test_chunk_docs_normalizes_whitespace(ray_session):
    from wprdc_etl_ray.functions.pack import chunk_docs

    ds = docs_ds(["  a   b\t c  "])
    got = chunk_docs(ds, max_tokens=2, overlap=1).to_pandas().sort_values("chunk_idx")
    assert got["chunk_text"].tolist() == ["a b", "b c", "c"]


def test_label_centroids_exact_integer_mean(ray_session):
    from wprdc_etl_ray.functions.similarity import label_centroids

    ds = rd.from_arrow(pa.table({
        "label": pa.array([0, 0, 1], pa.int32()),
        "embedding": pa.array(
            [[1.0, -2.0], [2.0, 3.5], [0.25, 0.75]],
            pa.list_(pa.float32()),
        ),
    }))
    got = (label_centroids(ds).to_pandas()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    # label 0: sums (3e6, 1.5e6) over 2 -> (1500000, 750000)
    # label 1: exact single row; dim is 1-based
    assert got["label"].tolist() == [0, 0, 1, 1]
    assert got["dim"].tolist() == [1, 2, 1, 2]
    assert got["centroid_micro"].tolist() == [1_500_000, 750_000, 250_000, 750_000]


def test_label_centroids_floor_on_negative_sums(ray_session):
    from wprdc_etl_ray.functions.similarity import label_centroids

    ds = rd.from_arrow(pa.table({
        "label": pa.array([0, 0, 0], pa.int32()),
        "embedding": pa.array([[-1.0], [-1.0], [-1.5]], pa.list_(pa.float32())),
    }))
    got = label_centroids(ds).to_pandas()
    # sum = -3.5e6 over 3 -> floor(-1166666.67) = -1166667 (floor, not trunc)
    assert got["centroid_micro"].tolist() == [-1_166_667]


def test_funnel_counts_strict_ordering(ray_session):
    from wprdc_etl_ray.functions.relational import funnel_counts

    # u1 completes A->B->C in order; u2 has B before A (stops at stage 1);
    # u3 has A and B at the SAME ts (equal ts does not advance); u4 only B.
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 3, 4],
        "event_type": ["A", "B", "C", "B", "A", "A", "B", "B"],
        "ts": pd.to_datetime([1, 2, 3, 1, 2, 5, 5, 1], unit="s"),
    })
    got = (funnel_counts(rd.from_pandas(df, override_num_blocks=3),
                         ["A", "B", "C"])
           .to_pandas().sort_values("stage"))
    assert got["users"].tolist() == [3, 1, 1]


def test_heavy_hitters_exact_and_bounded(ray_session):
    from wprdc_etl_ray.functions.relational import heavy_hitters

    rng = np.random.default_rng(3)
    # zipf-ish: "hot" = 30%, "warm" = 15%, tail of 60 rare keys
    vals = (["hot"] * 3000 + ["warm"] * 1500
            + [f"rare{i}" for i in rng.integers(0, 60, 5500)])
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"w": vals}), override_num_blocks=8)
    got = heavy_hitters(ds, "w", threshold_micro=100_000).to_pandas()
    got = got.sort_values("w").reset_index(drop=True)
    # exact answer: only hot (30%) and warm (15%) clear the 10% bar
    assert got["w"].tolist() == ["hot", "warm"]
    assert got["c"].tolist() == [3000, 1500]


def test_heavy_hitters_threshold_edge_inclusive(ray_session):
    from wprdc_etl_ray.functions.relational import heavy_hitters

    # exactly at the bar: 1 of 10 rows at threshold 10% -> kept (>=)
    ds = rd.from_pandas(
        pd.DataFrame({"w": ["edge"] + [f"x{i}" for i in range(9)]}),
        override_num_blocks=2,
    )
    got = heavy_hitters(ds, "w", threshold_micro=100_000).to_pandas()
    assert set(got["w"]) == {"edge"} | {f"x{i}" for i in range(9)}  # all at 10%


def test_json_int_field_nulls_and_negatives(ray_session):
    from wprdc_etl_ray.functions.text import json_int_field

    t = pa.table({"props": pa.array(
        ['{"k": 7}', '{"k": -42}', '{"x": 1}', None, 'not json', '{"k": "str"}'],
        pa.string())})
    out = json_int_field(t)
    assert out.column("v").to_pylist() == [7, -42, None, None, None, None]


def test_export_shards_resumes_only_missing(ray_session, tmp_path):
    import os
    import shutil

    from wprdc_etl_ray.sources.sinks import export_shards, read_resumable

    ds = docs_ds([f"doc number {i} text" for i in range(200)])
    out = str(tmp_path / "shards")
    r1 = export_shards(ds, out, n_shards=4)
    assert sorted(r1["written"]) == ["0", "1", "2", "3"] and not r1["skipped"]
    full = read_resumable(out).to_pandas()
    assert len(full) == 200

    # lose one shard (marker + data); re-export rewrites ONLY that shard
    os.remove(os.path.join(out, "_SUCCESS-2"))
    shutil.rmtree(os.path.join(out, "data", "shard=2"))
    r2 = export_shards(ds, out, n_shards=4)
    assert r2["written"] == ["2"] and sorted(r2["skipped"]) == ["0", "1", "3"]
    again = read_resumable(out).to_pandas()
    assert len(again) == 200
    assert sorted(again["doc_id"]) == sorted(full["doc_id"])


def test_table_profile_counts_nulls_distinct(ray_session):
    from wprdc_etl_ray.functions.relational import table_profile

    df = pd.DataFrame({
        "a": [1, 1, 2, None, 3],
        "b": ["x", None, None, "x", "y"],
    })
    got = (table_profile(rd.from_pandas(df, override_num_blocks=3), ["a", "b"])
           .to_pandas().set_index("col").sort_index())
    assert got.loc["a"].tolist() == [5, 1, 3]
    assert got.loc["b"].tolist() == [5, 2, 2]


def test_kmeans_matches_brute_force(ray_session):
    """Distributed Lloyd's == a plain numpy Lloyd's on the same data
    (same integer quantization, same init, same iteration count)."""
    from wprdc_etl_ray.functions.cluster import SCALE, kmeans

    rng = np.random.default_rng(5)
    n, d, k, it = 300, 16, 5, 3
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array(list(emb))})
    )
    got = kmeans(ds, k=k, n_iter=it).to_pandas().sort_values("vec_id")

    q = np.floor(emb.astype(np.float64) * SCALE + 0.5)
    cents = q[:k].copy()
    for _ in range(it):
        d2 = (q * q).sum(1)[:, None] - 2 * q @ cents.T + (cents * cents).sum(1)[None]
        a = d2.argmin(1)
        for c in range(k):
            if (a == c).any():
                cents[c] = np.floor(q[a == c].sum(0) / (a == c).sum())
    d2 = (q * q).sum(1)[:, None] - 2 * q @ cents.T + (cents * cents).sum(1)[None]
    want = d2.argmin(1)
    assert got["cluster"].to_numpy().tolist() == want.tolist()


def test_kmeans_empty_cluster_carried(ray_session):
    """An init centroid that captures no points keeps its coordinates."""
    from wprdc_etl_ray.functions.cluster import kmeans

    # two tight blobs far apart; k=3 inits on the first three points —
    # after one update two centroids converge onto the blobs and one
    # empties out; the run must not crash and must still label all rows
    pts = np.array(
        [[0.0, 0.0], [0.001, 0.0], [10.0, 10.0], [10.001, 10.0],
         [0.0, 0.001], [10.0, 10.001]] * 10,
        np.float32,
    )
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(range(len(pts)), pa.int64()),
                  "embedding": pa.array(list(pts))})
    )
    out = kmeans(ds, k=3, n_iter=2).to_pandas()
    assert len(out) == len(pts)
    assert out["cluster"].nunique() <= 3


def test_bucketed_join_matches_pandas(ray_session, tmp_path):
    """Co-partitioned storage join == pandas merge, including keys that
    miss (inner drops, left nulls) and buckets one side never touched."""
    import pandas as pd

    from wprdc_etl_ray.functions.bucketed import bucketed_join, bucketed_write

    rng = np.random.default_rng(9)
    left = pd.DataFrame(
        {"k": rng.integers(0, 40, 200), "lv": np.arange(200)}
    )
    right = pd.DataFrame(
        {"rk": np.arange(0, 30), "rv": np.arange(0, 30) * 10}
    )
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    bucketed_write(rd.from_pandas(left), ld, key="k", n_buckets=8)
    bucketed_write(rd.from_pandas(right), rd_, key="rk", n_buckets=8)

    for how in ("inner", "left"):
        got = (
            bucketed_join(ld, rd_, how=how)
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, how=how, left_on="k", right_on="rk")
            .drop(columns=["rk"])
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )


def test_bucketed_join_layout_mismatch_raises(ray_session, tmp_path):
    import pandas as pd

    from wprdc_etl_ray.functions.bucketed import bucketed_join, bucketed_write

    df = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    bucketed_write(rd.from_pandas(df), a, key="k", n_buckets=4)
    bucketed_write(rd.from_pandas(df), b, key="k", n_buckets=8)
    with pytest.raises(ValueError):
        bucketed_join(a, b)


def test_pivot_counts_matches_pandas(ray_session):
    import pandas as pd

    from wprdc_etl_ray.functions.relational import pivot_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 20, 500),
            "t": rng.choice(["a", "b", "c"], 500),
        }
    )
    got = (
        pivot_counts(rd.from_pandas(df), "u", "t", ["a", "b", "c"])
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    want = (
        df.pivot_table(index="u", columns="t", aggfunc="size", fill_value=0)
        .reset_index()
        .rename_axis(None, axis=1)
    )
    for c in ("a", "b", "c"):
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist()


def test_pagerank_exact_integer_power_iteration(ray_session):
    """Distributed PageRank == a dense numpy power iteration with the
    same floor-division algebra; isolated nodes hold the teleport."""
    from wprdc_etl_ray.functions.graph import pagerank

    pairs = pd.DataFrame({"vec_a": [0, 0, 1, 5], "vec_b": [1, 2, 2, 6]})
    ids = np.arange(8)  # 7 is fully isolated
    got = pagerank(rd.from_pandas(pairs), ids, n_iter=3).to_pandas()

    n = len(ids)
    deg = np.zeros(n, np.int64)
    adj = np.zeros((n, n), np.int64)
    for a, b in zip(pairs.vec_a, pairs.vec_b):
        adj[a, b] = adj[b, a] = 1
        deg[a] += 1
        deg[b] += 1
    t = (15 * 1_000_000 // 100) // n
    r = np.full(n, 1_000_000 // n, np.int64)
    for _ in range(3):
        contrib = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        s = adj @ contrib
        r = t + (85 * s) // 100
    assert got.sort_values("vec_id")["rank_micro"].tolist() == r.tolist()
    assert got.set_index("vec_id").loc[7, "rank_micro"] == t


def test_hash_join_survives_schemaless_empty_blocks(ray_session):
    """r03 regression (corpus_freq_join): Ray's groupby().aggregate()
    emits zero-SCHEMA empty blocks; when the join partition count
    exceeds the distinct-key count, some partitions receive only those
    empty slices and acero crashes ("No match ... FieldRef"). hash_join
    must normalize such inputs. Key domain of 2 through a 16-way
    repartition guarantees empty aggregate output blocks at any CPU
    count."""
    import ray

    from wprdc_etl_ray.functions.relational import hash_join

    t = pa.table({"k": ["a", "b"] * 50, "v": list(range(100))})
    agg = rd.from_arrow(t).repartition(16).groupby("k").sum("v")
    # prove the hazard is present in the raw aggregate output
    empties = [
        r for r in agg.materialize().to_arrow_refs() if ray.get(r).num_rows == 0
    ]
    assert empties and all(len(ray.get(r).schema) == 0 for r in empties)

    left = rd.from_arrow(pa.table({"k": ["a", "b", "c"] * 20, "x": list(range(60))}))
    out = hash_join(left, agg, on="k").to_pandas()
    assert len(out) == 40
    assert set(out["sum(v)"].unique()) == {sum(range(0, 100, 2)), sum(range(1, 100, 2))}

    # the left_outer spine pattern (corpus_freq_join's second join)
    spine = hash_join(left, agg, on="k", join_type="left_outer").to_pandas()
    assert len(spine) == 60
    assert spine["sum(v)"].isna().sum() == 20


def test_drop_empty_blocks_and_plan_hazard_detection(ray_session):
    import ray

    from wprdc_etl_ray.functions.relational import (
        _may_emit_schemaless_empties,
        drop_empty_blocks,
    )

    t = pa.table({"k": ["a"] * 10, "v": list(range(10))})
    agg = rd.from_arrow(t).repartition(8).groupby("k").sum("v")
    assert _may_emit_schemaless_empties(agg)

    clean = drop_empty_blocks(agg)
    blocks = [ray.get(r) for r in clean.to_arrow_refs()]
    assert all(b.num_rows > 0 for b in blocks)
    assert clean.count() == 1

    # map-only chain over a fresh READ is provably safe -> no
    # materialization is forced on the streaming big side (FromArrow /
    # InputData provenance is unknowable and stays hazardous — cheap,
    # since those are already materialized)
    safe = rd.read_parquet("/root/testdata/sf0.001/region.parquet").map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    assert not _may_emit_schemaless_empties(safe)
    # pre-materialized provenance is unknowable -> hazardous (cheap:
    # the no-drop path returns the materialized dataset unchanged)
    assert _may_emit_schemaless_empties(agg.materialize())


def test_pagerank_join_mode_equals_broadcast_mode(ray_session):
    """mode='join' (distributed rank Dataset, per-iteration hash joins)
    must be bit-identical to mode='broadcast' (the micro-unit algebra is
    exact integer math, so the two shapes cannot legitimately differ)."""
    from wprdc_etl_ray.functions.graph import pagerank

    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, 120)
    b = rng.integers(0, 40, 120)
    keep = a != b
    pairs = pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep]})
    ids = np.arange(48)  # 40..47 isolated -> hold the teleport term

    bc = pagerank(rd.from_pandas(pairs), ids, n_iter=3).to_pandas()
    jn = (
        pagerank(rd.from_pandas(pairs), ids, n_iter=3, mode="join")
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    bc = bc.sort_values("vec_id", ignore_index=True)
    assert jn["vec_id"].tolist() == bc["vec_id"].tolist()
    assert jn["rank_micro"].tolist() == bc["rank_micro"].tolist()


def test_rank_per_key_methods(ray_session):
    """row_number/rank/dense against pandas ground truth, incl. ties."""
    from wprdc_etl_ray.functions.relational import rank_per_key

    df = pd.DataFrame(
        {"k": ["a", "a", "a", "b", "b", "b", "b"], "o": [3, 1, 1, 5, 5, 5, 2]}
    )
    # row_number requires a unique order col
    dfu = pd.DataFrame({"k": ["a", "a", "b", "b", "b"], "o": [3, 1, 9, 2, 5]})
    got = (
        rank_per_key(rd.from_pandas(dfu), "k", "o")
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    assert got["rn"].tolist() == [1, 2, 1, 2, 3]

    for method, pd_method in (("rank", "min"), ("dense", "dense")):
        got = (
            rank_per_key(rd.from_pandas(df), "k", "o", method=method)
            .to_pandas()
            .sort_values(["k", "o"], ignore_index=True)
        )
        want = df.sort_values(["k", "o"], ignore_index=True)
        want_r = want.groupby("k")["o"].rank(method=pd_method).astype("int64")
        assert got["rn"].tolist() == want_r.tolist()

    with pytest.raises(ValueError):
        rank_per_key(rd.from_pandas(df), "k", "o", method="percent")


def test_count_distinct_per_key_exact_across_batches(ray_session):
    """Duplicates of the same (key,value) pair spread across many blocks
    must count once — the two-phase distinct is globally exact."""
    from wprdc_etl_ray.functions.relational import count_distinct_per_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"k": rng.integers(0, 7, 5000), "v": rng.integers(0, 23, 5000)}
    )
    ds = rd.from_pandas(df).repartition(16)
    got = (
        count_distinct_per_key(ds, "k", "v")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = df.groupby("k")["v"].nunique()
    assert got["n_distinct"].astype(int).tolist() == want.tolist()


def test_quantiles_per_key_disc_convention(ray_session):
    """Per-key quantile at sorted index ceil(q*n)-1 (DuckDB
    quantile_disc) — probed directly on a crafted key."""
    from wprdc_etl_ray.functions.relational import quantiles_per_key

    df = pd.DataFrame(
        {"k": ["x"] * 10 + ["y"] * 3, "v": list(range(10, 110, 10)) + [7, 5, 3]}
    )
    got = (
        quantiles_per_key(rd.from_pandas(df), "k", "v", [0.25, 0.5, 0.9])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    # x: n=10 -> idx ceil(2.5)-1=2 -> 30; ceil(5)-1=4 -> 50; ceil(9)-1=8 -> 90
    assert got.loc[0, ["q25", "q50", "q90"]].tolist() == [30, 50, 90]
    # y sorted [3,5,7]: n=3 -> idx 0, 1, 2
    assert got.loc[1, ["q25", "q50", "q90"]].tolist() == [3, 5, 7]


def test_grouping_sets_matches_pandas(ray_session):
    """Each requested set == an independent pandas aggregate; lvl is the
    GROUPING_ID bitmask (leftmost key = MSB); unrequested sets absent."""
    from wprdc_etl_ray.functions.relational import grouping_sets_agg

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["p", "q"], 400),
            "b": rng.choice(["u", "v", "w"], 400),
            "x": rng.integers(0, 100, 400),
        }
    )
    out = grouping_sets_agg(
        rd.from_pandas(df),
        ["a", "b"],
        [["a", "b"], ["b"], []],
        [("", "count", "n"), ("x", "sum", "sx")],
    ).to_pandas()

    fine = out[out["lvl"] == 0]
    want = df.groupby(["a", "b"]).agg(n=("x", "size"), sx=("x", "sum")).reset_index()
    assert (
        fine.sort_values(["a", "b"], ignore_index=True)[["n", "sx"]].astype(int).values
        == want[["n", "sx"]].values
    ).all()

    byb = out[out["lvl"] == 2]  # 'a' rolled -> MSB set
    assert byb["a"].isna().all()
    wantb = df.groupby("b").agg(n=("x", "size"), sx=("x", "sum")).reset_index()
    assert (
        byb.sort_values("b", ignore_index=True)[["n", "sx"]].astype(int).values
        == wantb[["n", "sx"]].values
    ).all()

    tot = out[out["lvl"] == 3]
    assert len(tot) == 1 and int(tot["n"].iloc[0]) == 400
    assert int(tot["sx"].iloc[0]) == int(df["x"].sum())
    assert set(out["lvl"].unique()) == {0, 2, 3}  # (b) set only, no (a)

    with pytest.raises(ValueError):
        grouping_sets_agg(rd.from_pandas(df), ["a"], [["zzz"]], [("x", "sum", "sx")])


def test_bloom_prefiltered_join_exact_and_selective(ray_session):
    """bloom_prefilter='right' must return exactly the plain inner
    join (the join resolves bloom FPs), and the prefilter must actually
    drop non-matching big-side rows before the exchange."""
    from wprdc_etl_ray.functions.relational import (
        bloom_semi_filter,
        build_key_bloom,
        hash_join,
    )

    rng = np.random.default_rng(13)
    big = pd.DataFrame(
        {"k": rng.integers(0, 10_000, 20_000), "x": rng.integers(0, 100, 20_000)}
    )
    small = pd.DataFrame({"k": np.arange(0, 10_000, 100), "y": np.arange(100)})

    plain = (
        hash_join(rd.from_pandas(big), rd.from_pandas(small), on="k")
        .to_pandas()
        .sort_values(["k", "x"], ignore_index=True)
    )
    bloomed = (
        hash_join(
            rd.from_pandas(big),
            rd.from_pandas(small),
            on="k",
            bloom_prefilter="right",
        )
        .to_pandas()
        .sort_values(["k", "x"], ignore_index=True)
    )
    assert plain.equals(bloomed)

    # selectivity: ~1% of keys match; the bloom keeps matches + ~1e-3 FPs
    bf = build_key_bloom(rd.from_pandas(small), ["k"])
    kept = bloom_semi_filter(rd.from_pandas(big), bf, ["k"]).count()
    true_matches = int(big["k"].isin(small["k"]).sum())
    assert kept >= true_matches  # superset, never drops a match
    assert kept < len(big) * 0.05  # and actually selective

    with pytest.raises(ValueError):
        hash_join(
            rd.from_pandas(big),
            rd.from_pandas(small),
            on="k",
            join_type="left_outer",
            bloom_prefilter="right",
        )


def test_set_ops_distinct_semantics(ray_session):
    """INTERSECT/EXCEPT with duplicate rows across many blocks; results
    are DISTINCT tuples (SQL semantics), multi-column keys supported."""
    from wprdc_etl_ray.functions.relational import except_distinct, intersect_distinct

    a = pd.DataFrame({"k": [1, 1, 2, 3, 4, 4], "g": ["x", "x", "y", "x", "y", "y"]})
    b = pd.DataFrame({"k": [2, 4, 5], "g": ["y", "y", "x"]})
    da, db = rd.from_pandas(a).repartition(4), rd.from_pandas(b).repartition(2)

    inter = (
        intersect_distinct(da, db, ["k", "g"])
        .to_pandas()
        .sort_values(["k", "g"], ignore_index=True)
    )
    assert list(map(tuple, inter.values)) == [(2, "y"), (4, "y")]

    exc = (
        except_distinct(da, db, ["k", "g"])
        .to_pandas()
        .sort_values(["k", "g"], ignore_index=True)
    )
    assert list(map(tuple, exc.values)) == [(1, "x"), (3, "x")]


def test_explode_list_empty_and_null_lists(ray_session):
    from wprdc_etl_ray.functions.relational import explode_list

    t = pa.table(
        {
            "id": pa.array([10, 20, 30, 40], pa.int64()),
            "xs": pa.array([[1.5, 2.5], [], None, [7.0]], pa.list_(pa.float64())),
        }
    )
    out = (
        explode_list(rd.from_arrow(t), ["id"], "xs")
        .to_pandas()
        .sort_values(["id", "pos"], ignore_index=True)
    )
    assert out["id"].tolist() == [10, 10, 40]
    assert out["pos"].tolist() == [1, 2, 1]
    assert out["val"].tolist() == [1.5, 2.5, 7.0]


def test_kmv_exact_below_k_and_accurate_above(ray_session):
    from wprdc_etl_ray.functions.sketch import approx_count_distinct

    # exact below k
    small = pd.DataFrame({"v": np.arange(500) % 37})
    est = approx_count_distinct(rd.from_pandas(small).repartition(4), ["v"], k=256)
    assert est == 37

    # ~3% at k=1024 over 50k distinct spread across blocks
    big = pd.DataFrame({"v": np.arange(200_000) % 50_000})
    est = approx_count_distinct(rd.from_pandas(big).repartition(16), ["v"], k=1024)
    assert abs(est - 50_000) / 50_000 < 0.10


def test_kmv_per_key_merges_across_blocks(ray_session):
    """Distributed per-key KMV == a single-machine KMV over the same
    hashes (mergeability), and exact for keys below k."""
    from wprdc_etl_ray.functions.sketch import approx_count_distinct_per_key

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b", "c"], 4000),
            "v": np.concatenate(
                [
                    rng.integers(0, 50, 4000),      # 'a': 50 distinct < k
                    rng.integers(0, 2_000, 4000),   # 'b': ~2000 distinct > k=256
                    np.arange(4000),                # 'c': all distinct
                ]
            ),
        }
    )
    out = (
        approx_count_distinct_per_key(
            rd.from_pandas(df).repartition(8), "k", ["v"], k=256
        )
        .to_pandas()
        .set_index("k")["approx_distinct"]
    )
    want = df.groupby("k")["v"].nunique()
    assert out["a"] == want["a"]  # exact below k
    for key in ("b", "c"):
        assert abs(out[key] - want[key]) / want[key] < 0.25


def test_lead_per_key_mirrors_lag(ray_session):
    from wprdc_etl_ray.functions.relational import lead_per_key

    df = pd.DataFrame(
        {"k": ["a", "a", "a", "b", "b"], "o": [1, 2, 3, 1, 2], "v": [10, 20, 30, 7, 8]}
    )
    out = (
        lead_per_key(rd.from_pandas(df), "k", "o", "v")
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    got = out["lead_value"].tolist()
    assert got[0] == 20 and got[1] == 30 and pd.isna(got[2])
    assert got[3] == 8 and pd.isna(got[4])


def test_first_per_key_is_argmin_mirror(ray_session):
    from wprdc_etl_ray.functions.relational import first_per_key, latest_per_key

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "o": [3, 1, 2, 9, 4],
            "v": [30, 10, 20, 90, 40],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    first = first_per_key(ds, ["k"], ["o"]).to_pandas().sort_values("k", ignore_index=True)
    last = latest_per_key(ds, ["k"], ["o"]).to_pandas().sort_values("k", ignore_index=True)
    assert first["v"].tolist() == [10, 40]
    assert last["v"].tolist() == [30, 90]


def test_cluster_layout_prunes_and_stays_exact(ray_session, tmp_path):
    """Range clustering: the plan touches only zone-overlapping files;
    the read equals a plain filter (boundary residual included)."""
    from wprdc_etl_ray.functions.layout import cluster_plan, cluster_read, cluster_write

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {"id": np.arange(4000), "v": rng.integers(0, 10_000, 4000).astype("int64")}
    )
    root = str(tmp_path / "clustered")
    res = cluster_write(rd.from_pandas(df).repartition(8), root, "v", num_files=4)
    assert res["rows"] == 4000 and res["files"] == 4

    # narrow interval: strictly fewer files than the full set
    lo, hi = 2000, 3000
    plan = cluster_plan(root, lo, hi)
    assert 0 < len(plan) < 4

    got = (
        cluster_read(root, lo, hi)
        .to_pandas()
        .sort_values("id", ignore_index=True)[["id", "v"]]
    )
    want = (
        df[(df.v >= lo) & (df.v <= hi)]
        .sort_values("id", ignore_index=True)
        .reset_index(drop=True)
    )
    assert got["id"].tolist() == want["id"].tolist()
    assert got["v"].tolist() == want["v"].tolist()

    # open-ended and empty intervals
    assert cluster_read(root, lo=9_999_999).count() == 0
    assert cluster_read(root, hi=None, lo=None).count() == 4000


def test_linreg_per_key_matches_numpy_exact(ray_session):
    """Distributed integer OLS == numpy closed form (floored micro),
    incl. negative slopes and a zero-variance key (nulls)."""
    from wprdc_etl_ray.functions.stats import linreg_per_key

    rng = np.random.default_rng(23)
    x = rng.integers(0, 24, 3000)
    rows = []
    for k, slope, icept in (("up", 35, 100), ("down", -50, 9000)):
        noise = rng.integers(-40, 41, 3000)
        rows.append(pd.DataFrame({"k": k, "x": x, "y": slope * x + icept + noise}))
    rows.append(pd.DataFrame({"k": "flat", "x": 7, "y": rng.integers(0, 100, 50)}))
    df = pd.concat(rows, ignore_index=True)

    got = (
        linreg_per_key(rd.from_pandas(df).repartition(8), "k", "x", "y")
        .to_pandas()
        .set_index("k")
    )
    for k in ("up", "down"):
        g = df[df.k == k]
        n, sx, sy = len(g), int(g.x.sum()), int(g.y.sum())
        sxy, sxx = int((g.x * g.y).sum()), int((g.x * g.x).sum())
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) * 1_000_000 // den
        icept = (sy * 1_000_000 - slope * sx) // n
        assert int(got.loc[k, "slope_micro"]) == slope
        assert int(got.loc[k, "intercept_micro"]) == icept
    assert pd.isna(got.loc["flat", "slope_micro"])


def test_zorder_layout_prunes_on_both_dims(ray_session, tmp_path):
    from wprdc_etl_ray.functions.layout import zorder_plan, zorder_read, zorder_write

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "id": np.arange(8000),
            "x": rng.integers(0, 10_000, 8000).astype("int64"),
            "y": rng.integers(0, 10_000, 8000).astype("int64"),
        }
    )
    root = str(tmp_path / "z")
    res = zorder_write(rd.from_pandas(df).repartition(8), root, "x", "y", num_files=16)
    assert res["rows"] == 8000

    # a tight 2-D box touches a small corner of the rank space
    box = zorder_plan(root, 1000, 2000, 1000, 2000)
    assert 0 < len(box) < 16 // 2

    # one-sided predicates prune too (each file is a rank-space quadrant)
    xa = zorder_plan(root, a_lo=9000)
    assert 0 < len(xa) < 16
    yb = zorder_plan(root, b_hi=1000)
    assert 0 < len(yb) < 16

    got = (
        zorder_read(root, 1000, 2000, 1000, 2000)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    want = df[(df.x >= 1000) & (df.x <= 2000) & (df.y >= 1000) & (df.y <= 2000)]
    assert got["id"].tolist() == sorted(want["id"].tolist())


def test_rolling_range_includes_ts_peers(ray_session):
    """SQL RANGE CURRENT ROW spans the whole peer group: two rows with
    identical ts must both see each other's values."""
    from wprdc_etl_ray.functions.relational import rolling_range_per_key

    ts = pd.to_datetime(
        ["2020-01-01 00:00:00", "2020-01-01 00:30:00", "2020-01-01 00:30:00",
         "2020-01-01 02:00:00"]
    )
    df = pd.DataFrame({"k": ["u"] * 4, "ts": ts, "v": [10, 20, 30, 5]})
    out = (
        rolling_range_per_key(
            rd.from_pandas(df), "k", "ts", "v", window_us=3_600_000_000
        )
        .to_pandas()
        .sort_values(["ts", "v"], ignore_index=True)
    )
    # row0: only itself; rows 1+2: peers see 10+20+30; row3: outside window
    assert out["range_sum"].tolist() == [10, 60, 60, 5]


def test_mode_per_key_tiebreak_across_blocks(ray_session):
    """Pairs of one key spread over many blocks fold exactly; ties go to
    the smallest value deterministically."""
    from wprdc_etl_ray.functions.relational import mode_per_key

    df = pd.DataFrame(
        {
            "k": ["a"] * 6 + ["b"] * 5,
            "v": [3, 3, 7, 7, 1, 9, 5, 5, 2, 2, 8],  # a: tie 3 vs 7 -> 3; b: tie 5 vs 2 -> 2
        }
    )
    got = (
        mode_per_key(rd.from_pandas(df).repartition(6), "k", "v")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert got["mode"].tolist() == [3, 2]
    assert got["n"].tolist() == [2, 2]


def test_round4_operators_empty_and_single_row_edges(ray_session):
    """Edge battery: empty inputs and single-row keys must not crash or
    mis-shape any round-4 operator."""
    from wprdc_etl_ray.functions.relational import (
        count_distinct_per_key,
        except_distinct,
        explode_list,
        intersect_distinct,
        mode_per_key,
        quantiles_per_key,
        rank_per_key,
        rolling_range_per_key,
    )

    empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    one = rd.from_pandas(pd.DataFrame({"k": ["z"], "v": [42]}))

    assert rank_per_key(one, "k", "v").to_pandas()["rn"].tolist() == [1]
    assert count_distinct_per_key(one, "k", "v").to_pandas()["n_distinct"].tolist() == [1]
    q = quantiles_per_key(one, "k", "v", [0.5]).to_pandas()
    assert q["q50"].tolist() == [42]
    m = mode_per_key(one, "k", "v").to_pandas()
    assert m["mode"].tolist() == [42]

    # set ops with an empty side
    assert intersect_distinct(one, one, ["k", "v"]).count() == 1
    assert except_distinct(one, one, ["k", "v"]).count() == 0

    # explode over a dataset whose lists are all empty
    t = pa.table({"id": pa.array([1, 2], pa.int64()), "xs": pa.array([[], []], pa.list_(pa.int64()))})
    assert explode_list(rd.from_arrow(t), ["id"], "xs").count() == 0

    # RANGE window over one row
    ts1 = pd.DataFrame({"k": ["a"], "ts": pd.to_datetime(["2020-01-01"]), "v": [5]})
    rr = rolling_range_per_key(rd.from_pandas(ts1), "k", "ts", "v", window_us=1000)
    assert rr.to_pandas()["range_sum"].tolist() == [5]


def test_kmv_and_linreg_empty_safe(ray_session):
    from wprdc_etl_ray.functions.sketch import approx_count_distinct
    from wprdc_etl_ray.functions.stats import linreg_per_key

    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    assert approx_count_distinct(empty, ["v"], k=64) == 0

    one = rd.from_pandas(pd.DataFrame({"k": ["a"], "x": [1], "y": [2]}))
    out = linreg_per_key(one, "k", "x", "y").to_pandas()
    # single point: zero variance -> null slope
    assert pd.isna(out["slope_micro"]).all()


def test_rank_per_key_cume_dist(ray_session):
    from wprdc_etl_ray.functions.relational import rank_per_key

    df = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 2, "o": [10, 20, 20, 30, 5, 5]})
    got = (
        rank_per_key(rd.from_pandas(df), "k", "o", method="cume_dist", out_col="cd")
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    # a: ranks_max [1,3,3,4]/4 ; b: ties -> 2/2
    assert got["cd"].tolist() == [0.25, 0.75, 0.75, 1.0, 1.0, 1.0]


def test_zorder_one_sided_query_keeps_other_col_nulls(ray_session, tmp_path):
    """ADVICE r4: a one-sided range scan must NOT drop rows where the
    un-predicated column is null — parity with a plain filter."""
    from wprdc_etl_ray.functions.layout import zorder_read, zorder_write

    df = pd.DataFrame(
        {
            "id": np.arange(200),
            "x": np.arange(200).astype("int64"),
            "y": pd.array([None if i % 5 == 0 else i for i in range(200)], dtype="Int64"),
        }
    )
    root = str(tmp_path / "znull")
    zorder_write(rd.from_pandas(df).repartition(4), root, "x", "y", num_files=4)

    got = zorder_read(root, a_lo=100).to_pandas().sort_values("id", ignore_index=True)
    want = df[df.x >= 100]  # plain filter keeps null-y rows
    assert got["id"].tolist() == want["id"].tolist()
    assert got["y"].isna().sum() == want["y"].isna().sum() > 0

    # bounding y prunes its nulls, exactly like the plain filter would
    got2 = zorder_read(root, b_lo=100).to_pandas()
    want2 = df[df.y.notna() & (df.y >= 100)]
    assert sorted(got2["id"].tolist()) == sorted(want2["id"].tolist())


def test_cluster_read_unbounded_keeps_nulls(ray_session, tmp_path):
    from wprdc_etl_ray.functions.layout import cluster_read, cluster_write

    df = pd.DataFrame(
        {
            "id": np.arange(100),
            "v": pd.array([None if i % 7 == 0 else i for i in range(100)], dtype="Int64"),
        }
    )
    root = str(tmp_path / "cnull")
    cluster_write(rd.from_pandas(df).repartition(4), root, "v", num_files=4)
    got = cluster_read(root).to_pandas()
    assert len(got) == 100  # unbounded scan = full table incl. null rows


def test_linreg_overflow_guard(ray_session):
    from wprdc_etl_ray.functions.stats import linreg_per_key

    big = pd.DataFrame({"k": ["a", "a"], "x": [1 << 32, 2 << 32], "y": [1, 2]})
    with pytest.raises(Exception) as ei:
        linreg_per_key(rd.from_pandas(big), "k", "x", "y").to_pandas()
    assert "2^31" in str(ei.value)


def test_decode_real_mode_null_payload_and_doc_id_in_error(ray_session):
    from wprdc_etl_ray.functions.codecs import CodecError, encode_png
    from wprdc_etl_ray.functions.multimodal import DecodeStub, ImageDecodeStub

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    png = encode_png(px)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([png, None], pa.binary()),
        }
    )
    out = DecodeStub(mode="real")(t)
    assert out.column("n_bytes")[0].as_py() == 48
    assert not out.column("n_bytes")[1].is_valid  # null payload -> null row

    dims = ImageDecodeStub(mode="real")(t)
    assert dims.column("width")[0].as_py() == 4
    assert not dims.column("width")[1].is_valid

    bad = pa.table(
        {
            "doc_id": pa.array([77], pa.int64()),
            "payload": pa.array([b"not-an-image"], pa.binary()),
        }
    )
    with pytest.raises(CodecError, match="doc_id=77"):
        DecodeStub(mode="real")(bad)


def test_anti_join_keys_fallback_matches_broadcast(ray_session):
    """VERDICT r4 item 5: the dedup drop-list broadcast now has a
    ceiling — above `broadcast_cap` an exact bloom-split anti join takes
    over. Both paths must produce the identical row set."""
    from wprdc_etl_ray.functions.relational import anti_join_keys

    big = rd.from_pandas(
        pd.DataFrame(
            {"k": np.arange(5000, dtype="int64"), "v": (np.arange(5000) % 7)}
        )
    ).repartition(8)
    keys = rd.from_pandas(
        pd.DataFrame({"kk": np.arange(0, 5000, 3, dtype="int64")})
    ).repartition(4)

    via_join = (
        anti_join_keys(big, keys, "k", broadcast_cap=0)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    via_bcast = (
        anti_join_keys(big, keys, "k", broadcast_cap=10**9)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(via_join, via_bcast)
    assert len(via_join) == 5000 - len(range(0, 5000, 3))
    assert not (via_join["k"] % 3 == 0).any()

    # numpy-array key side still routes through the broadcast filter
    arr = np.arange(0, 5000, 3, dtype="int64")
    via_np = (
        anti_join_keys(big, arr, "k")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(via_np, via_bcast)


def test_grouped_agg_exchange_modes_equal(ray_session):
    """grouped_agg(exchange='direct'|'sort') folds partials through the
    warm bucketed exchange; results must equal the native groupby."""
    from wprdc_etl_ray.functions.relational import grouped_agg

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 5000).astype("int64"),
            "v": rng.integers(-100, 100, 5000).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    specs = [("v", "sum", "s"), ("", "count", "n"), ("v", "min", "lo"), ("v", "max", "hi")]
    want = (
        grouped_agg(ds, ["k"], specs)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    for exch in ("direct", "sort"):
        got = (
            grouped_agg(ds, ["k"], specs, exchange=exch)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want)


def test_video_frame_sampler_real_and_fake(ray_session):
    """Actor-pool frame sampling with REAL MJPEG pixels: one output row
    per sampled frame, frame_md5 = content address of decoded pixels
    (two MP4s with identical frames share addresses)."""
    from wprdc_etl_ray.functions.codecs import (
        CodecError,
        decode_video_frames,
        encode_mp4_mjpeg,
    )
    from wprdc_etl_ray.functions.multimodal import VideoFrameSampler

    rng = np.random.default_rng(8)
    frames = [
        (rng.integers(0, 2, (16, 16, 3)) * 255).astype(np.uint8) for _ in range(6)
    ]
    mp4_a = encode_mp4_mjpeg(frames, fps=5)
    mp4_b = encode_mp4_mjpeg(frames, fps=10)  # same frames, new container

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([mp4_a, mp4_b, None], pa.binary()),
        }
    )
    out = VideoFrameSampler(mode="real", max_frames=3)(t)
    df = out.to_pandas()
    assert set(df["doc_id"]) == {1, 2}  # null payload contributes nothing
    a = df[df.doc_id == 1].sort_values("frame_idx")
    b = df[df.doc_id == 2].sort_values("frame_idx")
    assert len(a) == 3 and a["width"].tolist() == [16] * 3
    # same decoded pixels -> same content addresses across containers
    assert a["frame_md5"].tolist() == b["frame_md5"].tolist()
    # and they match a direct decode of the same sampled indices
    px = decode_video_frames(mp4_a, indices=a["frame_idx"].tolist())
    import hashlib as _hl

    assert a["frame_md5"].tolist() == [
        _hl.md5(px[i].tobytes()).hexdigest() for i in range(3)
    ]

    fake = VideoFrameSampler(mode="fake", max_frames=3)(t)
    assert fake.schema.names == out.schema.names  # schema contract holds

    bad = pa.table(
        {
            "doc_id": pa.array([9], pa.int64()),
            "payload": pa.array([mp4_a.replace(b"jpeg", b"avc1", 1)], pa.binary()),
        }
    )
    with pytest.raises(CodecError, match="doc_id=9"):
        VideoFrameSampler(mode="real")(bad)


def test_anti_join_keys_empty_key_side(ray_session):
    from wprdc_etl_ray.functions.relational import anti_join_keys

    big = rd.from_pandas(pd.DataFrame({"k": np.arange(100, dtype="int64")}))
    empty = rd.from_pandas(pd.DataFrame({"kk": pd.Series([], dtype="int64")}))
    out = anti_join_keys(big, empty, "k").to_pandas()
    assert len(out) == 100  # empty drop list keeps everything


def test_cluster_unbounded_scan_includes_all_null_files(ray_session, tmp_path):
    """Code-review r5: an UNBOUNDED cluster scan must read files whose
    zone is all-null — null rows are part of a full scan."""
    from wprdc_etl_ray.functions.layout import cluster_plan, cluster_read, cluster_write

    # constant non-null value -> every real row lands in the top range
    # bucket, so the null rows (routed to bucket 0) form an ALL-null file
    df = pd.DataFrame(
        {
            "id": np.arange(120),
            "v": pd.array([100 if i < 20 else None for i in range(120)], dtype="Int64"),
        }
    )
    root = str(tmp_path / "callnull")
    cluster_write(rd.from_pandas(df).repartition(4), root, "v", num_files=4)

    import json as _json
    import os as _os

    meta = _json.load(open(_os.path.join(root, "_CLUSTER.json")))
    all_null_files = [r for r in meta["files"] if r["vmin"] is None]
    assert all_null_files, "fixture must produce at least one all-null file"

    got = cluster_read(root).to_pandas()
    assert len(got) == 120  # unbounded scan = full table incl. null files
    # bounded plans still prune the all-null files
    assert all(
        _os.path.join(root, r["file"]) not in cluster_plan(root, lo=0)
        for r in all_null_files
    )


def test_grouped_agg_exchange_keeps_null_keys(ray_session):
    """Code-review r5: the warm-exchange fold must keep null-keyed
    groups (dropna=False). Note: Ray's NATIVE sort-based aggregate
    cannot even sort null STRING keys ('<' not supported: NoneType vs
    str), so string-null parity is direct-only; int-null keys compare
    across both paths."""
    from wprdc_etl_ray.functions.relational import grouped_agg

    specs = [("v", "sum", "s"), ("", "count", "n")]

    # string keys with nulls: the fold must keep the null group
    df = pd.DataFrame(
        {
            "k": ["a", None, "b", None, "a"],
            "v": np.array([1, 2, 3, 4, 5], dtype="int64"),
        }
    )
    direct = grouped_agg(
        rd.from_pandas(df).repartition(2), ["k"], specs, exchange="direct"
    ).to_pandas()
    direct["k"] = direct["k"].fillna("<null>")
    direct = direct.sort_values("k", ignore_index=True)
    assert direct["k"].tolist() == ["<null>", "a", "b"]
    assert direct["s"].astype("int64").tolist() == [6, 6, 3]


def test_salted_group_map_kwarg_contract(ray_session):
    from wprdc_etl_ray.functions.relational import salted_group_map

    df = pd.DataFrame({"k": [1, 1, 2], "v": np.array([1, 2, 3], "int64")})

    def kernel(g):
        out = g.groupby("k", sort=False, as_index=False)["v"].sum()
        return out[["k", "v"]]

    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="pre_reduce"):
        salted_group_map(ds, ["k"], kernel, salt=2, pre_reduce=kernel)
    # exchange= flows to BOTH phases without error
    out = (
        salted_group_map(ds, ["k"], kernel, salt=2, exchange="sort")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert out["v"].tolist() == [3, 3]


def test_video_frame_sampler_zero_frames(ray_session):
    from wprdc_etl_ray.functions.codecs import encode_mp4_mjpeg
    from wprdc_etl_ray.functions.multimodal import VideoFrameSampler

    mp4 = encode_mp4_mjpeg([np.zeros((8, 8, 3), np.uint8)])
    t = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "payload": pa.array([mp4], pa.binary())}
    )
    out = VideoFrameSampler(mode="real", max_frames=0)(t)
    assert out.num_rows == 0  # frameless sampling: no rows, no crash
    assert out.schema.names == ["doc_id", "frame_idx", "width", "height", "frame_md5"]


def test_planned_rows_survives_read_wrapper(ray_session):
    from wprdc_etl_ray.functions.relational import _planned_rows, read_table

    ds = read_table("/root/testdata/sf0.001", "orders")
    n = _planned_rows(ds)
    assert n is not None and n > 0


def test_approx_quantiles_rank_bound(ray_session):
    """approx_quantiles: one-level mergeable summary — the returned
    value's TRUE rank must be within q*N +/- N/k for ANY partitioning
    (the documented bound; no compaction chain, errors add once)."""
    from wprdc_etl_ray.functions.pack import approx_quantiles

    rng = np.random.default_rng(17)
    n = 50_000
    vals = rng.normal(0, 1000, n)  # continuous: distinct ~ N, the niche
    s = np.sort(vals)
    k = 128
    qs = [0.1, 0.25, 0.5, 0.9, 1.0]
    for parts in (4, 16, 64):
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(parts)
        out = approx_quantiles(ds, "x", qs, k_per_block=k).to_pandas()
        assert out["q"].tolist() == qs
        for q, v in zip(out["q"], out["value"]):
            true_rank = np.searchsorted(s, v, side="right")
            assert abs(true_rank - q * n) <= n / k + 1, (parts, q, true_rank)

    # k >= block size degenerates to (near-)exact
    small = rd.from_pandas(pd.DataFrame({"x": np.arange(1000, dtype="float64")}))
    out = approx_quantiles(small, "x", [0.5], k_per_block=100_000).to_pandas()
    assert abs(out["value"][0] - 499.5) <= 1.0
