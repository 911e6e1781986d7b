"""Naive Bayes classifier + exact AUC + Pareto frontier
(operators/classify.py, plans/mlops.py)."""

import math

from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.classify import (
    GRID,
    exact_auc,
    nb_score,
    nb_train,
)


def _nb_replica(train_rows, test_rows):
    """Plain-python multinomial NB with the same 1e9 ln grid."""
    from collections import Counter, defaultdict

    n_tc = defaultdict(Counter)
    n_docs_c = Counter()
    for cls, text in train_rows:
        n_docs_c[cls] += 1
        for tok in text.strip().split():
            n_tc[cls][tok] += 1
    vocab = {t for c in n_tc.values() for t in c}
    v = len(vocab)
    n = sum(n_docs_c.values())
    t_c = {c: sum(cnt.values()) for c, cnt in n_tc.items()}

    def q(x):
        return int(round(x * GRID))

    out = {}
    for doc_id, text in test_rows:
        best = None
        for cls in sorted(n_docs_c):
            s = q(math.log(n_docs_c[cls] / n))
            for tok in text.strip().split():
                if tok not in vocab:
                    continue
                s += q(
                    math.log(
                        (n_tc[cls][tok] + 1) / (t_c[cls] + v)
                    )
                )
            # argmax, ties to smallest class name
            if best is None or s > best[1]:
                best = (cls, s)
        out[doc_id] = (best[0], best[1] / GRID)
    return out


class TestNaiveBayes:
    def _run(self, spark, train_rows, test_rows):
        train = spark.createDataFrame(
            train_rows, ["cls", "text"]
        )
        test = spark.createDataFrame(
            test_rows, ["doc_id", "text"]
        )
        toks = F.split(F.trim(F.col("text")), r"\s+")
        tm, cm = nb_train(train, "cls", toks)
        got = {
            r.doc_id: (r.pred_cls, r.score)
            for r in nb_score(
                test, "doc_id", toks, tm, cm
            ).collect()
        }
        return got

    def test_matches_python_replica(self, spark):
        train = [
            ("en", "the cat sat on the mat"),
            ("en", "the dog ate the food"),
            ("es", "el gato come pescado"),
            ("es", "el perro duerme en la casa"),
        ]
        test = [
            (1, "the cat ate"),
            (2, "el gato duerme"),
            (3, "the el"),
            (4, "unseen tokens only zzz"),
        ]
        got = self._run(spark, train, test)
        want = _nb_replica(train, test)
        assert got == want

    def test_all_oov_doc_scores_prior_only(self, spark):
        train = [("a", "x x x"), ("a", "x y"), ("b", "z")]
        test = [(1, "qqq www")]
        got = self._run(spark, train, test)
        # prior(a)=2/3 beats prior(b)=1/3; score is the prior only
        assert got[1][0] == "a"
        assert got[1][1] == round(
            math.log(2 / 3) * GRID
        ) / GRID

    def test_tie_breaks_to_smallest_class(self, spark):
        # symmetric classes: identical counts -> identical scores
        train = [("a", "x"), ("b", "x")]
        test = [(1, "x")]
        got = self._run(spark, train, test)
        assert got[1][0] == "a"

    def test_class_scores_full_frame(self, spark):
        """nb_class_scores: every (doc, class) pair present —
        in-vocab docs via the scored path, all-OOV docs completed
        prior-only (the label_noise_report contract)."""
        import math as _math

        from afg_data_pipeline_spark.operators.classify import (
            nb_class_scores,
        )

        train = [("a", "x x x"), ("a", "x y"), ("b", "z")]
        test = [(1, "x z"), (2, "qqq www")]
        train_df = spark.createDataFrame(train, ["cls", "text"])
        test_df = spark.createDataFrame(
            test, ["doc_id", "text"]
        )
        toks = F.split(F.trim(F.col("text")), r"\s+")
        tm, cm = nb_train(train_df, "cls", toks)
        rows = nb_class_scores(
            test_df, "doc_id", toks, tm, cm
        ).collect()
        got = {(r.doc_id, r.cls): int(r.score_q) for r in rows}
        # full frame: 2 docs x 2 classes
        assert set(got) == {(1, "a"), (1, "b"), (2, "a"), (2, "b")}
        # all-OOV doc 2 scores the PRIOR exactly, per class
        assert got[(2, "a")] == round(_math.log(2 / 3) * GRID)
        assert got[(2, "b")] == round(_math.log(1 / 3) * GRID)
        # in-vocab doc 1: strictly below the bare prior (adds
        # negative token log-likelihoods)
        assert got[(1, "a")] < round(_math.log(2 / 3) * GRID)
        assert got[(1, "b")] < round(_math.log(1 / 3) * GRID)


class TestExactAuc:
    def _auc(self, spark, rows):
        df = spark.createDataFrame(rows, ["score", "is_pos"])
        r = exact_auc(df, "score", "is_pos").collect()[0]
        return r.auc, r.n_pos, r.n_neg

    def test_perfect_separation(self, spark):
        rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
        auc, np_, nn = self._auc(spark, rows)
        assert (auc, np_, nn) == (1.0, 5, 5)

    def test_perfectly_wrong_is_zero(self, spark):
        rows = [(float(i), 0 if i >= 5 else 1) for i in range(10)]
        assert self._auc(spark, rows)[0] == 0.0

    def test_all_tied_scores_is_half(self, spark):
        rows = [(1.0, 1)] * 4 + [(1.0, 0)] * 6
        assert self._auc(spark, rows)[0] == 0.5

    def test_midrank_ties_exact_fraction(self, spark):
        # pos scores {1, 2}, neg scores {1, 3}:
        # pairs: (1,1)=0.5 (tie), (1,3)=0, (2,1)=1, (2,3)=0
        # U = 1.5 of 4 -> AUC = 0.375
        rows = [(1.0, 1), (2.0, 1), (1.0, 0), (3.0, 0)]
        assert self._auc(spark, rows)[0] == 0.375


class TestParetoFrontier:
    def test_frontier_on_plan_shape(self, spark):
        # replicate the plan's logic on a tiny frame via the
        # registered query's semantics: dominated points drop,
        # duplicates of a frontier point all survive.
        from pyspark.sql import Window

        rows = [
            (1, 10.0, 5),   # frontier (cheapest)
            (2, 10.0, 9),   # dominated by 1 (same price, bigger)
            (3, 20.0, 3),   # frontier (smaller size than 1)
            (4, 20.0, 3),   # duplicate of 3 -> also frontier
            (5, 30.0, 3),   # dominated by 3 (same size, pricier)
            (6, 25.0, 4),   # dominated by 3
            (7, 40.0, 1),   # frontier
        ]
        pts = spark.createDataFrame(
            rows, ["pk", "price", "size"]
        ).withColumn(
            "pc",
            F.round(F.col("price") * 100).cast("bigint"),
        )
        pp = pts.groupBy("pc").agg(
            F.min("size").alias("min_size")
        )
        w = Window.orderBy("pc").rowsBetween(
            Window.unboundedPreceding, -1
        )
        fp = pp.withColumn(
            "runmin_prev", F.min("min_size").over(w)
        )
        out = (
            pts.join(fp, "pc")
            .filter(
                (F.col("size") == F.col("min_size"))
                & (
                    F.col("runmin_prev").isNull()
                    | (F.col("size") < F.col("runmin_prev"))
                )
            )
            .select("pk")
        )
        assert sorted(r.pk for r in out.collect()) == [1, 3, 4, 7]


class TestCalibrationBins:
    def test_bins_partition_the_held_out_docs(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        rows = REGISTRY["score_calibration_bins"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        # bins form a partition: every bin id in 1..10, counts sum
        # to the held-out half, accuracy = n_correct/n exactly
        assert all(1 <= r.bin <= 10 for r in rows)
        n_test = (
            spark.read.parquet(
                "/root/testdata/sf0.001/documents.parquet"
            )
            .filter("doc_id % 2 = 1")
            .count()
        )
        assert sum(r.n for r in rows) == n_test
        for r in rows:
            assert r.accuracy == r.n_correct / r.n
            assert 0.0 <= r.accuracy <= 1.0
