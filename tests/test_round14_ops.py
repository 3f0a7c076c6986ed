"""Round-14 additions.

Covers
- plans/vector.py::similarity_topk_pq_trained /
  similarity_pq_trained_recall — the Lloyd-trained PQ tier: plan
  shape (no non-broadcast cartesian), codebook totality (every
  (subspace, codeword) cell present, empty cells falling back to the
  seed codeword), a python re-derivation of one trained codeword, and
  the ledger claim itself (trained recall >= seed recall on the same
  fixture/depth).
- operators/multimodal.py::audio_windows — the numpy-vectorized
  decode must agree row-for-row with a straightforward per-sample
  python reference on the fixture (guards the sliding-window padding
  and remainder arithmetic).
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import functions as F

# ------------------------------------------------- trained PQ tier


def test_pq_trained_plan_no_unbroadcast_cartesian(spark, sf_dir):
    """Training adds an E/M aggregate pass but nothing in the full
    plan may be a non-broadcast cartesian/BNLJ — same discipline as
    the seed tier (tests/test_round13_ops.py). Since the r17
    codebook memoization the training pass runs once per session
    inside the memo build, so the discipline is asserted on BOTH
    plans: the consumer's (encode + ADC) and the codebook build's
    (the E-step)."""
    from eye_of_sauron_spark.plans.vector import (
        _pq_trained_codebook,
        similarity_topk_pq_trained,
    )
    from eye_of_sauron_spark.sources import load_table

    plan = similarity_topk_pq_trained(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # exactly the 2 deliberate 1-row/queries-sized broadcasts in the
    # consumer plan (codebook row x corpus for encode, query set x
    # recon for ADC; the seeds-x-corpus E-step lives in the memoized
    # codebook build below) — a join that falls OUT of broadcast
    # hash join into BNLJ would raise this count; one of the deliberate
    # broadcasts becoming a hash join would lower it (update on purpose)
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan

    cb_plan = _pq_trained_codebook(
        load_table(spark, sf_dir, "embeddings")
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in cb_plan, cb_plan
    # the one deliberate broadcast of the training pass: the 1-row
    # seed-codebook x corpus E-step
    assert cb_plan.count("BroadcastNestedLoopJoin") == 1, cb_plan


def test_pq_trained_codebook_total_and_reconstructible(spark, sf_dir):
    """The codebook row must hold all 8 subspaces x 16 codewords x
    8 positions (empty Lloyd cells fall back to seed codewords, so
    totality holds by construction), and one codeword must equal the
    python re-derivation of the micro-mean over its seed-assigned
    members."""
    from eye_of_sauron_spark.plans.vector import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBDIM,
        _pq_trained_codebook,
    )
    from eye_of_sauron_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    row = _pq_trained_codebook(emb).collect()
    assert len(row) == 1
    cbs = row[0]["cbs"]
    assert [c["m"] for c in cbs] == list(range(_PQ_M))
    for c in cbs:
        assert [w["seed_id"] for w in c["cws"]] == list(range(_PQ_K))
        assert all(len(w["ce"]) == _PQ_SUBDIM for w in c["cws"])

    # python re-derivation for subspace 0: assign every vector to its
    # nearest seed subvector under the micro-quantized (dm, seed_id)
    # rule, then micro-mean the members per position
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    seeds = {i: vecs[i][:_PQ_SUBDIM] for i in range(_PQ_K)}
    members: dict[int, list] = {i: [] for i in range(_PQ_K)}
    for vid, e in vecs.items():
        sub = e[:_PQ_SUBDIM]
        best = min(
            (
                (
                    math.floor(
                        math.sqrt(
                            sum(
                                (float(a) - float(b)) ** 2
                                for a, b in zip(sub, s)
                            )
                        )
                        * 1000000
                    ),
                    sid,
                )
                for sid, s in seeds.items()
            )
        )
        members[best[1]].append(sub)
    def _trunc_div(a: int, b: int) -> int:
        # Spark `div` / DuckDB `//` truncate toward zero on negatives
        return a // b if a >= 0 else -((-a) // b)

    for sid in range(_PQ_K):
        if members[sid]:
            want = [
                _trunc_div(
                    sum(
                        math.floor(float(v[p]) * 1000000 + 0.5)
                        for v in members[sid]
                    ),
                    len(members[sid]),
                )
                / 1000000.0
                for p in range(_PQ_SUBDIM)
            ]
        else:  # empty cell: the seed codeword's micro values
            want = [
                math.floor(float(v) * 1000000 + 0.5) / 1000000.0
                for v in seeds[sid]
            ]
        got = cbs[0]["cws"][sid]["ce"]
        assert all(abs(g - w) < 1e-12 for g, w in zip(got, want)), (
            sid,
            got,
            want,
        )


def test_pq_trained_lifts_recall_over_seed(spark, sf_dir):
    """The tier's reason to exist, pinned as an inequality on the
    fixture: mean recall@3 with trained codebooks >= mean recall with
    seed codebooks at the SAME shortlist depth (measured 0.53 -> 0.70
    at sf0.01, 0.43 -> 0.53 at sf0.001; SCALE.md round 14 records the
    scale dependence)."""
    from eye_of_sauron_spark.plans.vector import (
        similarity_pq_recall,
        similarity_pq_trained_recall,
    )

    seed = similarity_pq_recall(spark, sf_dir).agg(
        F.avg("recall").alias("r")
    ).collect()[0]["r"]
    trained = similarity_pq_trained_recall(spark, sf_dir).agg(
        F.avg("recall").alias("r")
    ).collect()[0]["r"]
    assert 0.0 <= seed <= 1.0 and 0.0 <= trained <= 1.0
    assert trained >= seed, (trained, seed)


def test_pq_trained_output_shape(spark, sf_dir):
    from eye_of_sauron_spark.plans.vector import (
        _PQ_TOPK,
        similarity_topk_pq_trained,
    )

    rows = similarity_topk_pq_trained(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert per_q, "no query rows"
    for qid, rs in per_q.items():
        assert len(rs) <= _PQ_TOPK
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: r["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["cosine"] >= b["cosine"]
        assert all(r["cand_id"] != qid for r in rs)


# -------------------------------------- vectorized audio decode


def test_audio_vectorized_decode_matches_python_reference(spark, sf_dir):
    """audio_windows' numpy path (frombuffer + padded strided view)
    vs a per-sample python decode of the same encoded blobs — catches
    padding leaking into sum_sq/peak and off-by-ones in the remainder
    window."""
    from eye_of_sauron_spark.operators.multimodal import (
        _AUD_MAGIC,
        _AUD_STRIDE,
        _AUD_WIN,
        audio_windows,
        encode_audio,
    )
    from eye_of_sauron_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    enc = encode_audio(docs)
    got = {
        (r["doc_id"], r["window_idx"]): r
        for r in audio_windows(enc).collect()
    }
    want = {}
    for r in enc.collect():
        b = bytes(r["audio"])
        assert b[:4] == _AUD_MAGIC
        rate, ch, n = struct.unpack(">HHH", b[4:10])
        samples = struct.unpack(f"<{n}h", b[10 : 10 + 2 * n])
        n_w = max(0, -(-(n - _AUD_WIN) // _AUD_STRIDE)) + 1
        for w in range(n_w):
            seg = samples[w * _AUD_STRIDE : w * _AUD_STRIDE + _AUD_WIN]
            want[(r["doc_id"], w)] = (
                rate,
                len(seg),
                sum(x * x for x in seg),
                max(abs(x) for x in seg),
            )
    assert set(got) == set(want)
    for k, (rate, n_s, sum_sq, peak) in want.items():
        g = got[k]
        assert (g["sample_rate"], g["n_samples"], g["sum_sq"], g["peak"]) == (
            rate,
            n_s,
            sum_sq,
            peak,
        ), k
