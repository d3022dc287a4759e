"""Model-based check of column mapping under DML churn: a seeded
random sequence of rename / drop+re-add / append / update / delete /
merge / bloom-index ops runs against both the real table and a pure-
Python model that tracks the CURRENT logical column name; after every
op the table must equal the model under the current names, and a
random historical version must still read under ITS OWN names —
exactly the interaction surface (mapping x tombstones x evolution x
time travel) where single-feature tests miss bugs."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M

N_OPS = 10


def _read(spark, t, vname, version=None):
    rows = M.read_version(spark, t, version).collect()
    return {
        int(r["k"]): (None if r[vname] is None else int(r[vname]))
        for r in rows
    }


@pytest.mark.parametrize("seed", [11, 47])
def test_mapping_dml_model(spark, seed, tmp_path):
    rng = random.Random(seed)
    t = str(tmp_path / f"tbl{seed}")
    vname = "v"  # current logical name of the payload column
    next_key = 200
    model = {k: k * 10 for k in range(200)}
    M.commit(
        spark.createDataFrame(
            sorted(model.items()), "k long, v long"
        ).repartition(3),
        t,
    )
    history = {1: ("v", dict(model))}

    def frame(rows):
        return spark.createDataFrame(
            sorted(rows), f"k long, {vname} long"
        )

    for step in range(N_OPS):
        op = rng.choice(
            ["rename", "append", "update", "delete", "merge",
             "bloom", "drop_readd", "addcol"]
        )
        if op == "rename":
            new = f"v{step}_{seed}"
            v = M.rename_column(t, vname, new)
            vname = new
        elif op == "append":
            ks = range(next_key, next_key + rng.randint(5, 30))
            next_key = ks.stop
            add = {k: k * 10 for k in ks}
            model.update(add)
            v = M.commit(frame(add.items()).repartition(2), t)
        elif op == "update" and model:
            cut = rng.choice(sorted(model))
            delta = rng.randint(1, 99)
            v = M.update_where(
                spark,
                t,
                [("k", ">=", cut)],
                {vname: F.col(vname) + delta},
            )
            model = {
                k: (p + delta if k >= cut and p is not None else p)
                for k, p in model.items()
            }
        elif op == "delete" and model:
            cut = rng.choice(sorted(model))
            v = M.delete_where(t, [("k", "<", cut)])
            model = {k: p for k, p in model.items() if k >= cut}
        elif op == "merge" and model:
            upd = rng.sample(sorted(model), min(len(model), 10))
            ins = range(next_key, next_key + rng.randint(0, 8))
            next_key = ins.stop
            rows = {k: rng.randint(0, 10**6) for k in upd}
            rows.update({k: k * 10 for k in ins})
            v = M.merge_into(spark, t, frame(rows.items()), ["k"])
            model.update(rows)
        elif op == "bloom":
            v = M.add_bloom_index(spark, t, ["k"])
        elif op == "drop_readd":
            # drop the payload column, then append rows carrying a
            # SAME-NAMED fresh column: every pre-drop value must read
            # NULL (retired physical name, no resurrection)
            M.drop_column(t, vname)
            ks = range(next_key, next_key + rng.randint(3, 10))
            next_key = ks.stop
            add = {k: k * 10 for k in ks}
            model = {k: None for k in model}
            model.update(add)
            v = M.commit(frame(add.items()), t)
        elif op == "addcol":
            # drop then METADATA-ONLY re-add of the same name (r11
            # add_column, no data write): the retired physical means
            # every existing row reads NULL, and later update/merge
            # ops in this sequence write the fresh column normally
            M.drop_column(t, vname)
            v = M.add_column(t, vname, "long")
            model = {k: None for k in model}
        else:
            continue
        history[v] = (vname, dict(model))

        assert _read(spark, t, vname) == model, (
            f"seed={seed} step={step} op={op}"
        )
        # stats-pruned read under the current logical names
        if model:
            cut = rng.choice(sorted(model))
            pruned = _read_where(spark, t, vname, [("k", ">=", cut)])
            assert pruned == {
                k: p for k, p in model.items() if k >= cut
            }, f"seed={seed} step={step} op={op} pruned"
        # time travel under the names of THAT version
        hv = rng.choice(sorted(history))
        hname, hmodel = history[hv]
        assert _read(spark, t, hname, hv) == hmodel, (
            f"seed={seed} step={step} time-travel v{hv}"
        )


def _read_where(spark, t, vname, where):
    rows = M.read_version(spark, t, where=where).collect()
    return {
        int(r["k"]): (None if r[vname] is None else int(r[vname]))
        for r in rows
    }
