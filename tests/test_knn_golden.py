"""Full-output value pin for the rows-only knn_impute_series query
(the W3/M4 pandas-UDF path — the last rows-only registry entry
without a cell-for-cell golden, mirroring test_multimodal_golden's
approach: replicate the UDF in plain numpy over the COLLECTED real
input and require exact equality on every cell of the registered
query's complete output).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _featured(spark):
    """The registered query's UDF input, built the same way
    plans/reference_semantics.knn_impute_series builds it."""
    from afg_data_pipeline_spark.operators.timeseries import (
        hourly_user_grid,
    )

    grid = hourly_user_grid(spark, SF_DIR)
    user_stats = grid.groupBy("user_id").agg(
        F.avg("avg_value").alias("user_mean")
    )
    return grid.join(F.broadcast(user_stats), "user_id").select(
        "user_id",
        "hidx",
        "avg_value",
        (F.col("user_id").cast("double") / 10.0).alias("f_user"),
        F.coalesce(F.col("user_mean"), F.lit(0.0)).alias("f_mean"),
    )


def _replica(rows, k=3):
    """Pure-pandas/numpy replica of operators/imputation.knn_impute
    over the per-hidx slices: same sort (NaN last), same distance
    arithmetic, same k-nearest 1/d weighting with the zero-distance
    uniform rule. Returns {(user_id, hidx): filled}."""
    pdf = pd.DataFrame(
        rows,
        columns=["user_id", "hidx", "avg_value", "f_user", "f_mean"],
    )
    out: dict = {}
    feature_cols = ["f_user", "f_mean"]
    for _, sl in pdf.groupby("hidx"):
        sl = sl.sort_values(
            feature_cols + ["avg_value"]
        ).reset_index(drop=True)
        vals = sl["avg_value"].to_numpy(dtype=float)
        feats = sl[feature_cols].to_numpy(dtype=float)
        missing = np.isnan(vals)
        filled = vals.copy()
        if missing.any() and (~missing).any():
            donors = np.flatnonzero(~missing)
            dfeat = feats[donors]
            for i in np.flatnonzero(missing):
                d = np.sqrt(((dfeat - feats[i]) ** 2).sum(axis=1))
                order = np.argsort(d, kind="stable")[:k]
                dd = d[order]
                if (dd == 0).any():
                    sel = donors[order[dd == 0]]
                    filled[i] = vals[sel].mean()
                else:
                    wgt = 1.0 / dd
                    filled[i] = float(
                        (wgt * vals[donors[order]]).sum()
                        / wgt.sum()
                    )
        for uid, hidx, f in zip(
            sl["user_id"], sl["hidx"], filled
        ):
            out[(int(uid), int(hidx))] = f
    return out


class TestKnnGolden:
    def test_registered_query_matches_replica_exactly(self, spark):
        """Every cell of the registered query's 10 800-row output
        at sf0.001 equals the numpy replica bit-for-bit (the input
        floats are identical — the replica consumes the collected
        UDF input — and the replica repeats the UDF's own numpy
        arithmetic, so any divergence is a real semantics change,
        never float noise)."""
        from afg_data_pipeline_spark.plans import REGISTRY

        feat_rows = [tuple(r) for r in _featured(spark).collect()]
        golden = _replica(feat_rows)

        got = REGISTRY["knn_impute_series"].fn(
            spark, SF_DIR
        ).collect()
        assert len(got) == len(golden) == 10800
        # avg_value must round-trip untouched, filled must be exact
        in_vals = {
            (int(r[0]), int(r[1])): r[2] for r in feat_rows
        }
        n_imputed = 0
        for r in got:
            key = (int(r["user_id"]), int(r["hidx"]))
            want = golden[key]
            have = r["value_filled"]
            if r["avg_value"] is None:
                n_imputed += 1
            else:
                assert r["avg_value"] == in_vals[key]
            if have is None or (
                isinstance(have, float) and math.isnan(have)
            ):
                assert math.isnan(want), key
            else:
                assert have == want, (key, have, want)
        # the pin is only meaningful if imputation actually ran
        assert n_imputed > 100, n_imputed
