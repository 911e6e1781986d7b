"""Round-8 additions: filter funnel, logistic-Newton, span scrub,
hamming-band recall audit. The registry-wide oracle gate
(test_correctness) already hash-checks each against DuckDB at
sf0.001; these tests pin the SEMANTICS independently (python
replicas and structural invariants), per the operator-test
convention (CLAUDE.md rule 7)."""

from __future__ import annotations

import math

from afg_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_DIR


class TestFilterFunnel:
    def test_chain_invariants(self, spark):
        rows = {
            r["stage"]: r
            for r in REGISTRY["filter_funnel_report"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(rows) == {1, 2, 3, 4, 5}
        for s in range(1, 6):
            r = rows[s]
            assert r["n_out"] == r["n_in"] - r["n_dropped"], s
            assert 0 <= r["n_sole_reject"], s
            if s > 1:
                assert r["n_in"] == rows[s - 1]["n_out"], s
        # total docs enter stage 1
        import pandas as pd

        n_docs = len(
            pd.read_parquet(f"{SF_DIR}/documents.parquet")
        )
        assert rows[1]["n_in"] == n_docs

    def test_replica(self, spark):
        import pandas as pd

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        flags = []
        for _, row in docs.iterrows():
            toks = [
                t for t in (row["text"] or "").strip().split()
                if t
            ]
            n = len(toks)
            dist = len(set(toks))
            mx = max(
                (toks.count(t) for t in set(toks)), default=0
            )
            chars = sum(len(t) for t in toks)
            mlen = max((len(t) for t in toks), default=0)
            flags.append(
                (
                    8 <= n <= 4096,
                    2 * n <= chars <= 12 * n,
                    8 * dist >= n,
                    4 * mx <= n,
                    mlen <= 24,
                )
            )
        got = {
            r["stage"]: r
            for r in REGISTRY["filter_funnel_report"]
            .fn(spark, SF_DIR)
            .collect()
        }
        for s in range(1, 6):
            n_in = sum(
                1 for f in flags if all(f[: s - 1])
            )
            n_drop = sum(
                1
                for f in flags
                if all(f[: s - 1]) and not f[s - 1]
            )
            sole = sum(
                1
                for f in flags
                if not f[s - 1]
                and all(f[j] for j in range(5) if j != s - 1)
            )
            assert got[s]["n_in"] == n_in, s
            assert got[s]["n_dropped"] == n_drop, s
            assert got[s]["n_sole_reject"] == sole, s


class TestLogisticNewton:
    def test_replica(self, spark):
        import numpy as np
        import pandas as pd

        r = (
            REGISTRY["logistic_newton_purchase"]
            .fn(spark, SF_DIR)
            .collect()[0]
        )
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        # events.ts is INT64 nanos in the parquet (rule 4)
        ts = pd.to_datetime(ev["ts"])
        x1 = ts.dt.hour.to_numpy(dtype=np.int64)
        # Spark dayofweek: Sunday=1..Saturday=7; pandas: Mon=0
        x2 = ((ts.dt.dayofweek.to_numpy() + 1) % 7 + 1).astype(
            np.int64
        )
        y = (ev["event_type"] == "purchase").to_numpy(int)
        X = np.column_stack(
            [np.ones_like(x1), x1, x2]
        ).astype(float)
        # step 1 from beta=0: delta = 2 * (X^T X)^-1 X^T (2y-1)
        M = X.T @ X
        g = X.T @ (2 * y - 1)
        b1 = 2 * np.linalg.solve(M, g)
        assert r["n_obs"] == len(ev)
        for got, want in zip(
            (r["b0_step1"], r["b1_step1"], r["b2_step1"]), b1
        ):
            assert math.isclose(
                got, want, rel_tol=1e-9, abs_tol=1e-12
            ), (got, want)
        # step 2 with the 1e6-grid quantized sigmoid
        z = X @ np.array([r["b0_step1"], r["b1_step1"], r["b2_step1"]])
        pq = np.round(1e6 / (1 + np.exp(-z))).astype(np.int64)
        wq = pq * (1000000 - pq)
        df = y * 1000000 - pq
        A = (X * wq[:, None]).T @ X
        b = 1e6 * (X.T @ df)
        b2 = np.array(
            [r["b0_step1"], r["b1_step1"], r["b2_step1"]]
        ) + np.linalg.solve(A, b)
        for got, want in zip(
            (r["b0_step2"], r["b1_step2"], r["b2_step2"]), b2
        ):
            assert math.isclose(
                got, want, rel_tol=1e-6, abs_tol=1e-9
            ), (got, want)
        # a Newton step from 0 must move toward the class prior
        p_hat = y.mean()
        z0 = r["b0_step2"] + r["b1_step2"] * x1.mean() + (
            r["b2_step2"] * x2.mean()
        )
        assert abs(1 / (1 + math.exp(-z0)) - p_hat) < 0.2


class TestSpanScrub:
    def test_replica(self, spark):
        import pandas as pd

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        toks = {
            int(r["doc_id"]): [
                t for t in (r["text"] or "").strip().split() if t
            ]
            for _, r in docs.iterrows()
        }
        n_docs = len(docs)
        gram_docs: dict[str, set[int]] = {}
        for d, ts in toks.items():
            for i in range(len(ts) - 2):
                g = " ".join(ts[i : i + 3])
                gram_docs.setdefault(g, set()).add(d)
        flagged = {
            g for g, ds in gram_docs.items()
            if 10 * len(ds) > n_docs
        }
        got = {
            int(r["doc_id"]): r
            for r in REGISTRY["boilerplate_span_scrub"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(toks)
        for d, ts in toks.items():
            covered = set()
            for i in range(len(ts) - 2):
                if " ".join(ts[i : i + 3]) in flagged:
                    covered.update((i, i + 1, i + 2))
            kept = [
                t for i, t in enumerate(ts) if i not in covered
            ]
            r = got[d]
            assert r["clean_text"] == " ".join(kept), d
            assert r["n_tokens_before"] == len(ts), d
            assert r["n_tokens_removed"] == len(covered), d


class TestHammingAudit:
    def test_pigeonhole_and_bounds(self, spark):
        rows = (
            REGISTRY["hamming_band_recall_audit"]
            .fn(spark, SF_DIR)
            .collect()
        )
        assert rows, "no true pairs at sf0.001 sample"
        for r in rows:
            assert 0 <= r["n_found"] <= r["n_true_pairs"]
            assert 0.0 <= r["recall"] <= 1.0
            if r["hamming_band"] == "00-03":
                # Hamming < n_bands cannot miss (pigeonhole)
                assert r["recall"] == 1.0


class TestTrainingOrderShuffle:
    def test_replica_and_interleave(self, spark):
        import hashlib

        import pandas as pd

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        h = {
            int(r["doc_id"]): hashlib.md5(
                f"trainorder:{int(r['doc_id'])}".encode()
            ).hexdigest()
            for _, r in docs.iterrows()
        }
        per_src: dict[str, list[int]] = {}
        for _, r in docs.iterrows():
            per_src.setdefault(r["source"], []).append(
                int(r["doc_id"])
            )
        src_pos = {}
        for s, ids in per_src.items():
            for p, d in enumerate(
                sorted(ids, key=lambda d: (h[d], d))
            ):
                src_pos[d] = (p, s)
        order = sorted(
            src_pos, key=lambda d: (src_pos[d][0], src_pos[d][1])
        )
        want_global = {d: i for i, d in enumerate(order)}
        got = {
            int(r["doc_id"]): r
            for r in REGISTRY["training_order_shuffle"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(want_global)
        for d, r in got.items():
            assert r["source_pos"] == src_pos[d][0], d
            assert r["global_pos"] == want_global[d], d
        # interleave property: among the first |sources| global
        # positions, every source with >=1 doc appears exactly once
        n_src = len(per_src)
        first = sorted(got.values(), key=lambda r: r["global_pos"])[
            :n_src
        ]
        assert len({r["source"] for r in first}) == n_src


class TestEmbeddingStats:
    def test_replica(self, spark):
        import numpy as np
        import pandas as pd

        emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        X = np.stack(emb["embedding"].to_numpy()).astype(
            np.float64
        )
        Q = np.round(X * 1e6).astype(np.int64)
        got = {
            r["dim"]: r
            for r in REGISTRY["embedding_stats_report"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(range(1, X.shape[1] + 1))
        n = float(len(Q))
        for d in range(X.shape[1]):
            q = Q[:, d].astype(object)  # exact python ints
            sq = float(sum(q))
            sqq = float(sum(v * v for v in q))
            r = got[d + 1]
            assert r["n_vectors"] == len(Q)
            assert abs(r["mean"] - sq / (n * 1e6)) < 1e-12
            want_var = (n * sqq - sq * sq) / (n * n * 1e12)
            assert abs(r["variance"] - want_var) < 1e-12, d


class TestDedupThresholdSweep:
    def test_monotone_and_consistent(self, spark):
        rows = {
            r["threshold"]: r
            for r in REGISTRY["dedup_threshold_sweep"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert sorted(rows) == [50, 60, 70, 80, 90]
        prev_pairs = prev_docs = None
        for t in sorted(rows):
            r = rows[t]
            # tighter threshold can only shrink the dup set
            if prev_pairs is not None:
                assert r["n_pairs"] <= prev_pairs
                assert r["n_dup_docs"] <= prev_docs
            prev_pairs, prev_docs = r["n_pairs"], r["n_dup_docs"]
            assert 0.0 <= r["dup_doc_rate"] <= 1.0
            # a pair touches <= 2 docs
            assert r["n_dup_docs"] <= 2 * r["n_pairs"]

    def test_matches_minhash_near_dup(self, spark):
        pairs = (
            REGISTRY["minhash_near_dup"]
            .fn(spark, SF_DIR)
            .collect()
        )
        want = sum(1 for p in pairs if p["jaccard"] * 100 >= 70)
        got = {
            r["threshold"]: r["n_pairs"]
            for r in REGISTRY["dedup_threshold_sweep"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert got[70] == want


class TestBucketedJoin:
    def test_no_exchange_and_values(self, spark):
        from pyspark.sql import functions as F

        from afg_data_pipeline_spark.io import read_star_table

        df = REGISTRY["bucketed_join_revenue"].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the whole point: co-located scans, zero shuffles for
        # the join itself (the final 5-group aggregate may still
        # exchange its tiny partials)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, plan
        assert "bucket" in plan.lower(), plan
        # values equal the plain join
        o = read_star_table(spark, "orders", SF_DIR)
        li = read_star_table(spark, "lineitem", SF_DIR)
        want = {
            r["o_orderpriority"]: r["n"]
            for r in li.join(
                o, li.l_orderkey == o.o_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {
            r["o_orderpriority"]: r["n_items"]
            for r in df.collect()
        }
        assert got == want


class TestEpochUpsample:
    def test_replica(self, spark):
        import hashlib

        import pandas as pd

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        cfg = {"src0": (2, 5), "src1": (2, 5), "src2": (1, 2)}
        thr = {0: "0000", 5: "8000", 2: "3333"}
        want = {}
        for _, r in docs.iterrows():
            src = r["source"]
            if src not in cfg:
                continue
            whole, frac10 = cfg[src]
            h = hashlib.md5(
                f"epoch:{int(r['doc_id'])}".encode()
            ).hexdigest()
            extra = 1 if h < thr[frac10] else 0
            n = whole + extra
            if n:
                want[int(r["doc_id"])] = (src, n)
        got: dict[int, list[int]] = {}
        src_of = {}
        for row in (
            REGISTRY["epoch_upsample_plan"]
            .fn(spark, SF_DIR)
            .collect()
        ):
            got.setdefault(int(row["doc_id"]), []).append(
                row["copy_idx"]
            )
            src_of[int(row["doc_id"])] = row["source"]
        assert set(got) == set(want)
        for d, (src, n) in want.items():
            assert src_of[d] == src
            assert sorted(got[d]) == list(range(n)), d


class TestDatasetManifest:
    def test_replica(self, spark):
        import hashlib

        import pandas as pd

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        want: dict[str, list[int]] = {}
        for _, r in docs.iterrows():
            h = hashlib.md5(
                f"{int(r['doc_id'])}|{r['text']}".encode()
            ).hexdigest()
            hsum = sum(
                ord(h[i]) * (128**i) for i in range(8)
            )
            toks = [
                t for t in (r["text"] or "").strip().split() if t
            ]
            acc = want.setdefault(r["source"], [0, 0, 0, 0])
            acc[0] += 1
            acc[1] += len(toks)
            acc[2] += len(r["text"])
            acc[3] += hsum
        got = {
            r["source"]: r
            for r in REGISTRY["dataset_manifest"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(want)
        for s, (nd, nt, nc, cs) in want.items():
            r = got[s]
            assert r["n_docs"] == nd
            assert r["n_tokens"] == nt
            assert r["n_chars"] == nc
            assert r["content_checksum"] == str(cs), s

    def test_checksum_detects_any_change(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        base = {
            r["source"]: r["content_checksum"]
            for r in REGISTRY["dataset_manifest"]
            .fn(spark, SF_DIR)
            .collect()
        }
        # same docs re-read -> identical checksums (order/retry
        # invariance is the commutative-sum property)
        again = {
            r["source"]: r["content_checksum"]
            for r in REGISTRY["dataset_manifest"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert base == again


class TestTCloseness:
    def test_replica(self, spark):
        import pandas as pd

        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        ts = pd.to_datetime(ev["ts"])
        # Spark dayofweek: Sun=1..Sat=7; pandas: Mon=0..Sun=6
        dow = (ts.dt.dayofweek + 1) % 7 + 1
        vb = (ev["value"] / 10.0).apply(
            lambda x: int(math.floor(x))
        )
        df = pd.DataFrame(
            {
                "dow": dow,
                "vb": vb,
                "t": ev["event_type"],
            }
        )
        big_n = len(df)
        nv = df.groupby("t").size().to_dict()
        counts = {}
        for (d, b, t), n in (
            df.groupby(["dow", "vb", "t"]).size().items()
        ):
            counts.setdefault((d, b), {})[t] = n
        s_num, n_g = {}, {}
        for grp, tv in counts.items():
            ng = sum(tv.values())
            n_g[grp] = ng
            s = sum(
                abs(c * big_n - nv[t] * ng)
                for t, c in tv.items()
            )
            s += (big_n - sum(nv[t] for t in tv)) * ng
            s_num[grp] = s
        out = {
            r["t_pct"]: r
            for r in REGISTRY["t_closeness_report"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(out) == {5, 10, 20, 30}
        for t_pct, r in out.items():
            above = [
                grp
                for grp, s in s_num.items()
                if 100 * s > 2 * n_g[grp] * big_n * t_pct
            ]
            assert r["groups_above_t"] == len(above), t_pct
            assert r["rows_at_risk"] == sum(
                n_g[g] for g in above
            ), t_pct
            assert r["n_groups"] == len(s_num)
            assert r["n_rows"] == big_n
            assert r["share_at_risk"] == (
                sum(n_g[g] for g in above) / float(big_n)
            )
        # monotone: a looser t flags fewer groups
        ts_sorted = sorted(out)
        for a, b in zip(ts_sorted, ts_sorted[1:]):
            assert (
                out[a]["groups_above_t"]
                >= out[b]["groups_above_t"]
            )


class TestDomainReweightMW:
    def test_invariants(self, spark):
        rows = (
            REGISTRY["domain_reweight_mw"]
            .fn(spark, SF_DIR)
            .collect()
        )
        assert len(rows) == 20  # 20 sources in the testdata
        grid = 1_000_000_000_000
        wsum = sum(r["mw_weight_q"] for r in rows)
        # exact floor-div renormalization: sum in (grid-n, grid]
        assert grid - len(rows) <= wsum <= grid
        # uniform start + monotone update factor => weight order
        # follows excess order
        by_ep = sorted(
            rows, key=lambda r: (r["ep_permille"], r["source"])
        )
        for a, b in zip(by_ep, by_ep[1:]):
            if a["ep_permille"] < b["ep_permille"]:
                assert a["mw_weight_q"] <= b["mw_weight_q"]
        # min-loss domain has zero excess; max has ep = 1000
        assert min(r["excess_q"] for r in rows) == 0
        assert max(r["ep_permille"] for r in rows) == 1000
        # per-round factor bound 1.25 => total spread <= 1.25^8
        ws = [r["mw_weight_q"] for r in rows]
        assert max(ws) <= min(ws) * (1.25**8) + len(rows)
        # baseline shares sum to 1
        assert (
            abs(sum(r["baseline_share"] for r in rows) - 1.0)
            < 1e-12
        )


class TestMMRDiversified:
    def test_full_replica(self, spark):
        import pandas as pd

        emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        vecs = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for _, r in emb.iterrows()
        }

        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        nrm = {i: math.sqrt(dot(v, v)) for i, v in vecs.items()}

        def cos(i, j):
            return dot(vecs[i], vecs[j]) / (nrm[i] * nrm[j])

        expected = []
        for q in sorted(i for i in vecs if i < 16):
            scored = sorted(
                ((cos(q, c), c) for c in vecs if c != q),
                key=lambda t: (-t[0], t[1]),
            )[:20]
            rel = {c: s for s, c in scored}
            sel = []
            for rank in range(1, min(5, len(rel)) + 1):
                best, bs = None, None
                for c in sorted(rel):
                    if c in sel:
                        continue
                    ms = (
                        max(cos(c, s) for s in sel)
                        if sel
                        else 0.0
                    )
                    score = 0.5 * rel[c] - 0.5 * ms
                    if best is None or score > bs:
                        best, bs = c, score
                sel.append(best)
                expected.append((q, rank, best, rel[best], bs))
        got = sorted(
            (
                int(r["query_id"]),
                int(r["sel_rank"]),
                int(r["neighbor_id"]),
                r["relevance"],
                r["mmr_score"],
            )
            for r in REGISTRY["mmr_diversified_topk"]
            .fn(spark, SF_DIR)
            .collect()
        )
        assert got == sorted(expected)

    def test_diversifies(self, spark):
        # MMR's selection must differ from plain top-5 relevance
        # for at least one query on this corpus (otherwise the
        # penalty term is dead code), and rank 1 must ALWAYS be
        # the relevance argmax.
        rows = (
            REGISTRY["mmr_diversified_topk"]
            .fn(spark, SF_DIR)
            .collect()
        )
        byq = {}
        for r in rows:
            byq.setdefault(r["query_id"], []).append(r)
        diffs = 0
        for q, rs in byq.items():
            rs = sorted(rs, key=lambda r: r["sel_rank"])
            top_rel = sorted(
                rs, key=lambda r: (-r["relevance"], r["neighbor_id"])
            )
            assert rs[0]["neighbor_id"] == top_rel[0]["neighbor_id"]
            mmr_set = [r["neighbor_id"] for r in rs]
            if mmr_set != [r["neighbor_id"] for r in top_rel]:
                diffs += 1
        assert diffs > 0

    def test_incomplete_pair_table_fails_loudly(self, spark):
        # the operator's contract: pairs must hold EVERY ordered
        # candidate pair per query. A missing pair must raise a
        # clear ValueError, not a bare KeyError deep inside
        # applyInPandas (ADVICE r8).
        import pytest as _pytest

        from afg_data_pipeline_spark.operators.mmr import (
            mmr_rerank,
        )

        pairs = spark.createDataFrame(
            # cand 2's sim row vs cand 1 is missing
            [
                (7, 1, 0.9, 1, 1.0),
                (7, 1, 0.9, 2, 0.5),
                (7, 2, 0.8, 2, 1.0),
            ],
            "query_id long, cand long, rel double, "
            "other long, sim double",
        )
        with _pytest.raises(Exception) as ei:
            mmr_rerank(pairs).collect()
        assert "incomplete pair table" in str(ei.value)


class TestKneserNey:
    def test_replica(self, spark):
        import pandas as pd
        from collections import Counter

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        bigrams_by_doc = {}
        bg = Counter()
        for _, row in docs.iterrows():
            toks = (row["text"] or "").strip().split()
            bs = list(zip(toks, toks[1:]))
            if bs:
                bigrams_by_doc[row["doc_id"]] = bs
                bg.update(bs)
        ctx = Counter()
        n1v = Counter()
        n1w = Counter()
        for (v, w), c in bg.items():
            ctx[v] += c
            n1v[v] += 1
            n1w[w] += 1
        n1 = sum(1 for c in bg.values() if c == 1)
        n2 = sum(1 for c in bg.values() if c == 2)
        n1tot = len(bg)
        D = n1 / (n1 + 2 * n2) if n1 + 2 * n2 > 0 else 0.5

        def p_kn(v, w):
            return max(bg[(v, w)] - D, 0.0) / ctx[v] + (
                D * n1v[v] / ctx[v]
            ) * (n1w[w] / n1tot)

        expected = {}
        for d, bs in bigrams_by_doc.items():
            qs = 0
            for v, w in bs:
                x = -math.log(p_kn(v, w)) * 1e9
                qs += math.floor(x + 0.5)  # HALF_UP like round()
            expected[d] = (len(bs), qs / 1e9 / len(bs))
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
            for r in REGISTRY["kneser_ney_bigram_score"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(expected)
        for d in expected:
            assert got[d][0] == expected[d][0], d
            assert abs(got[d][1] - expected[d][1]) < 1e-12, d

    def test_probabilities_normalize(self, spark):
        # For each context v, sum_w P_KN(w|v) over OBSERVED w plus
        # the backoff mass for unobserved w must be exactly 1 up to
        # float tolerance: sum over observed (cb-D)/ctx = 1 -
        # D*n1v/ctx, and the continuation term distributes
        # D*n1v/ctx * (sum_w n1w/n1tot) = D*n1v/ctx over the FULL
        # vocabulary. Verify on a small constructed corpus.
        import pandas as pd
        from collections import Counter

        texts = [
            "a b a c a b b c a",
            "b c b a c c a b",
            "c a c b a a b c",
        ]
        bg = Counter()
        for t in texts:
            toks = t.split()
            bg.update(zip(toks, toks[1:]))
        ctx = Counter()
        n1v = Counter()
        n1w = Counter()
        for (v, w), c in bg.items():
            ctx[v] += c
            n1v[v] += 1
            n1w[w] += 1
        n1 = sum(1 for c in bg.values() if c == 1)
        n2 = sum(1 for c in bg.values() if c == 2)
        n1tot = len(bg)
        D = n1 / (n1 + 2 * n2)
        vocab = set(n1w)
        for v in ctx:
            total = sum(
                max(bg.get((v, w), 0) - D, 0.0) / ctx[v]
                + (D * n1v[v] / ctx[v]) * (n1w[w] / n1tot)
                for w in vocab
            )
            assert abs(total - 1.0) < 1e-12, (v, total)


class TestEmbeddingDomainShift:
    def test_replica(self, spark):
        import pandas as pd
        from collections import defaultdict

        emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        src = dict(zip(docs["doc_id"], docs["source"]))
        sums = defaultdict(lambda: defaultdict(int))
        ns = defaultdict(int)
        for _, r in emb.iterrows():
            s = src.get(int(r["vec_id"]))
            if s is None:
                continue
            ns[s] += 1
            for i, x in enumerate(r["embedding"]):
                sums[s][i] += math.floor(float(x) * 1e4 + 0.5)
        big_n = sum(ns.values())
        gsum = defaultdict(int)
        for s in sums:
            for i, v in sums[s].items():
                gsum[i] += v
        got = {
            r["source"]: (r["n_vecs"], r["shift_l2"])
            for r in REGISTRY["embedding_domain_shift"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(ns)
        for s in ns:
            num_sq = sum(
                (sums[s][i] * big_n - gsum[i] * ns[s]) ** 2
                for i in gsum
            )
            exp = (
                math.sqrt(num_sq / float((ns[s] * big_n) ** 2))
                / 1e4
            )
            assert got[s][0] == ns[s], s
            assert abs(got[s][1] - exp) < 1e-12, s
        # mean-shift identity: sum over sources of n_s * shift
        # VECTOR is zero; as a weaker scalar check, not every
        # source can have zero shift unless all centroids match
        assert any(v[1] > 0 for v in got.values())


class TestMIFeatureRank:
    def test_replica(self, spark):
        import pandas as pd
        from collections import Counter, defaultdict

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        big_n = len(docs)
        n_y = Counter(docs["lang"])
        joint = defaultdict(Counter)  # t -> lang -> c1
        for _, r in docs.iterrows():
            toks = set((r["text"] or "").strip().split())
            for t in toks:
                joint[t][r["lang"]] += 1

        def lnq(num, den):
            return math.floor(
                math.log(num / den) * 1e9 + 0.5
            )

        rows = []
        for t, by_y in joint.items():
            n_t = sum(by_y.values())
            mi_q = 0
            for y, ny in n_y.items():
                c1 = by_y.get(y, 0)
                if c1 > 0:
                    mi_q += c1 * lnq(big_n * c1, n_t * ny)
                c0 = ny - c1
                if c0 > 0 and big_n - n_t > 0:
                    mi_q += c0 * lnq(
                        big_n * c0, (big_n - n_t) * ny
                    )
            rows.append((t, mi_q, n_t))
        rows.sort(key=lambda r: (-r[1], r[0]))
        expected = rows[:50]
        got = [
            (r["token"], r["mi_q"], r["n_docs_with"])
            for r in REGISTRY["mi_feature_rank"]
            .fn(spark, SF_DIR)
            .collect()
        ]
        assert got == expected
        # MI is non-negative up to grid rounding: the quantized
        # sum can dip a hair below zero only by accumulated
        # half-ulps; top-ranked entries must be strictly positive
        assert got[0][1] > 0


class TestConformal:
    def test_guarantee_and_invariants(self, spark):
        rows = {
            r["alpha_pct"]: r
            for r in REGISTRY["conformal_filter_threshold"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(rows) == {5, 10, 20}
        for a, r in rows.items():
            # rank formula
            assert r["k_rank"] == (a * (r["n_cal"] + 1)) // 100
            # coverage and set size live in [0, 1] x [0, |classes|]
            assert 0.0 <= r["coverage"] <= 1.0
            assert 0.0 <= r["avg_set_size"] <= 5.0
            # a prediction set always contains at least the
            # covered true class
            assert r["avg_set_size"] >= r["coverage"]
        # monotone in alpha: larger alpha -> higher threshold ->
        # less coverage, smaller sets
        assert (
            rows[5]["threshold_q"]
            <= rows[10]["threshold_q"]
            <= rows[20]["threshold_q"]
        )
        assert (
            rows[5]["coverage"]
            >= rows[10]["coverage"]
            >= rows[20]["coverage"]
        )
        assert (
            rows[5]["avg_set_size"]
            >= rows[10]["avg_set_size"]
            >= rows[20]["avg_set_size"]
        )
        # the conformal guarantee holds on this exchangeable
        # synthetic split with slack for finite-sample noise: at
        # alpha=20% coverage should not collapse far below 0.8
        assert rows[20]["coverage"] > 0.6


class TestLshBandPlan:
    def test_invariants(self, spark):
        rows = {
            (r["n_bands"], r["band_rows"]): r
            for r in REGISTRY["lsh_band_plan"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(rows) == {(16, 1), (8, 2), (4, 4), (2, 8)}
        # tighter banding => fewer candidates (subset property)
        order = [(16, 1), (8, 2), (4, 4), (2, 8)]
        for a, b in zip(order, order[1:]):
            assert (
                rows[a]["n_candidate_pairs"]
                >= rows[b]["n_candidate_pairs"]
            )
        for k, r in rows.items():
            assert r["n_est_dups"] <= r["n_candidate_pairs"]
            b, rr = k
            assert abs(
                r["t_star"] - (1.0 / b) ** (1.0 / rr)
            ) < 1e-15
        # est-dups (>=8/16 signature agreement) survive every
        # banding whose threshold is at/below 0.5: a pair agreeing
        # on >=8 of 16 hashes agrees on at least one 2-row band of
        # the (8,2) scheme only probabilistically — but it ALWAYS
        # shares a single hash, so (16,1) retains every est-dup
        assert rows[(16, 1)]["n_est_dups"] == max(
            r["n_est_dups"] for r in rows.values()
        )


class TestTheilSen:
    def test_replica(self, spark):
        import pandas as pd
        from collections import defaultdict

        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        ts = pd.to_datetime(ev["ts"])
        day = (
            ts.dt.normalize() - pd.Timestamp("1970-01-01")
        ).dt.days
        cents = ev["value"].apply(
            lambda x: math.floor(x * 100.0 + 0.5)
        )
        daily = defaultdict(int)
        for d, c in zip(day, cents):
            daily[int(d)] += int(c)
        days = sorted(daily)
        slopes = []
        for i, di in enumerate(days):
            for dj in days[i + 1:]:
                slopes.append(
                    (
                        (daily[dj] - daily[di]) / (dj - di),
                        di,
                        dj,
                    )
                )
        slopes.sort()
        n_pairs = len(slopes)
        slope = slopes[(n_pairs + 1) // 2 - 1][0]
        resid = sorted(
            (daily[d] - slope * d, d) for d in days
        )
        n_days = len(days)
        intercept = resid[(n_days + 1) // 2 - 1][0]
        r = (
            REGISTRY["theil_sen_trend"]
            .fn(spark, SF_DIR)
            .collect()
        )
        assert len(r) == 1
        r = r[0]
        assert r["n_days"] == n_days
        assert r["n_pairs"] == n_pairs
        assert r["slope_cents_per_day"] == slope
        assert r["intercept_cents"] == intercept

    def test_outlier_robustness_property(self, spark):
        # identity on constructed data: one wild outlier day must
        # not move the Theil-Sen slope (it moves OLS arbitrarily)
        days = list(range(20))
        vals = [100 + 5 * d for d in days]
        vals[10] = 10_000_000
        slopes = []
        for i in range(20):
            for j in range(i + 1, 20):
                slopes.append(
                    (vals[j] - vals[i]) / (j - i)
                )
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]
        assert abs(med - 5.0) < 1e-9


class TestRRFHybrid:
    def test_invariants(self, spark):
        rows = (
            REGISTRY["rrf_hybrid_rerank"]
            .fn(spark, SF_DIR)
            .collect()
        )
        byq = {}
        for r in rows:
            byq.setdefault(r["query_id"], []).append(r)
        assert set(byq) == {"q_vector", "q_quality", "q_dup"}
        for q, rs in byq.items():
            rs = sorted(rs, key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(
                range(1, len(rs) + 1)
            )
            # rrf ordering is consistent with the rank column
            for a, b in zip(rs, rs[1:]):
                assert (a["rrf_q"], -a["doc_id"]) >= (
                    b["rrf_q"],
                    -b["doc_id"],
                ), q
            # every fused rrf value equals the closed form
            for r in rs:
                assert r["rrf_q"] == (
                    10**12 // (60 + r["bm25_rank"])
                    + 10**12 // (60 + r["quality_rank"])
                )
            # fusion must not simply replicate bm25 order for
            # every query (otherwise the quality leg is dead)
        assert any(
            [r["bm25_rank"] for r in sorted(
                rs, key=lambda x: x["rank"])]
            != sorted(r["bm25_rank"] for r in rs)
            for rs in byq.values()
        )


class TestKSTwoSample:
    def test_replica(self, spark):
        import pandas as pd
        from collections import Counter

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        big_n = len(docs)
        vals = sorted(docs["n_chars"].unique())
        got = {
            r["source"]: r
            for r in REGISTRY["ks_two_sample_drift"]
            .fn(spark, SF_DIR)
            .collect()
        }
        for s in docs["source"].unique():
            mine = Counter(
                docs.loc[docs["source"] == s, "n_chars"]
            )
            alln = Counter(docs["n_chars"])
            n_s = sum(mine.values())
            n_r = big_n - n_s
            cum_s = cum_g = 0
            dnum = 0
            for v in vals:
                cum_s += mine.get(v, 0)
                cum_g += alln[v]
                dnum = max(
                    dnum,
                    abs(cum_s * n_r - (cum_g - cum_s) * n_s),
                )
            r = got[s]
            assert r["n_s"] == n_s and r["n_rest"] == n_r
            assert r["d_num"] == dnum, s
            assert r["ks_d"] == dnum / (n_s * n_r)
            assert 0.0 <= r["ks_d"] <= 1.0
            assert r["ks_stat"] >= 0.0


class TestMannWhitney:
    def test_replica(self, spark):
        import pandas as pd
        from collections import Counter

        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        got = {
            r["event_type"]: r
            for r in REGISTRY["ab_test_mann_whitney"]
            .fn(spark, SF_DIR)
            .collect()
        }
        for et in ev["event_type"].unique():
            sub = ev[ev["event_type"] == et]
            xa = [
                math.floor(v * 100 + 0.5)
                for u, v in zip(sub["user_id"], sub["value"])
                if u % 2 == 0
            ]
            xb = [
                math.floor(v * 100 + 0.5)
                for u, v in zip(sub["user_id"], sub["value"])
                if u % 2 == 1
            ]
            if len(xa) <= 1 or len(xb) <= 1:
                assert et not in got
                continue
            # O(n^2) reference U (doubled)
            u2 = 0
            for a in xa:
                for b in xb:
                    if a > b:
                        u2 += 2
                    elif a == b:
                        u2 += 1
            r = got[et]
            assert r["na"] == len(xa) and r["nb"] == len(xb)
            assert r["u2"] == u2, et
            assert r["cles"] == u2 / (
                2.0 * len(xa) * len(xb)
            )
            # z sanity: symmetric counterpart sums to 2*na*nb
            ca = Counter(xa + xb)
            ts = sum(t**3 - t for t in ca.values())
            n = len(xa) + len(xb)
            var = (
                len(xa) * len(xb) / 12.0
                * ((n + 1.0) - ts / (n * (n - 1.0)))
            )
            zexp = ((u2 - len(xa) * len(xb)) / 2.0) / math.sqrt(
                var
            )
            assert abs(r["z"] - zexp) < 1e-9, et
