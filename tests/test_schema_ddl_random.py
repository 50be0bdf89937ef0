"""Model-based randomized walk over the schema-DDL machinery: random
interleavings of add/rename/drop/retype and appends, checked row-for-row
against a pure-Python model. The field-id resolution has enough state
(persisted maps, lazy derivation, retired ids) that directed tests can
miss interaction orders; a seeded walk covers them mechanically."""

import random

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.table import Table

BASE_COLS = ("doc_id", "tokens", "n_tok", "source")


def _run_walk(spark, tmp_path, seed, n_ops=14):
    rng = random.Random(seed)
    t = Table.create(spark, str(tmp_path / f"tbl{seed}"))
    t.append(generate_sequences(spark, 60, seed=seed, max_tok=8))

    # model: column -> {doc_id: value} for every EXTRA column; base rows
    # are immutable and checked via count + token conservation
    extras: dict[str, dict] = {}  # live extra columns -> values by doc_id
    doc_ids = [r.doc_id for r in t.scan().select("doc_id").collect()]
    batch_no = 0

    for _ in range(n_ops):
        live = sorted(extras)
        op = rng.choice(
            ["add", "rename", "drop", "retype", "append"]
            if live
            else ["add", "append"]
        )
        if op == "add":
            name = f"c{rng.randrange(1000)}"
            if name in extras or name in BASE_COLS:
                continue
            t.add_column(name, rng.choice(["double", "bigint", "int"]))
            extras[name] = {d: None for d in doc_ids}
        elif op == "rename":
            old = rng.choice(live)
            new = f"r{rng.randrange(1000)}"
            if new in extras or new in BASE_COLS:
                continue
            t.rename_column(old, new)
            extras[new] = extras.pop(old)
        elif op == "drop":
            name = rng.choice(live)
            t.drop_column(name)
            del extras[name]
        elif op == "retype":
            # only int->long is modeled; pick a bigint-able column
            name = rng.choice(live)
            cur_type = dict(t.scan().dtypes)[name]
            if cur_type != "int":
                continue
            t.update_column_type(name, "bigint")
        else:  # append
            batch_no += 1
            df = generate_sequences(
                spark, 20, seed=1000 * seed + batch_no, max_tok=8
            )
            df = df.withColumn(
                "doc_id", F.concat(F.lit(f"b{batch_no}-"), F.col("doc_id"))
            ).drop("_olake_id")
            schema_types = {
                f.name: f.dataType.simpleString()
                for f in t.schema().fields
            }
            new_ids = None
            for name in sorted(extras):
                val = float(batch_no) if schema_types[name] == "double" else batch_no
                df = df.withColumn(
                    name, F.lit(val).cast(schema_types[name])
                )
            t.append(df)
            new_ids = [
                f"b{batch_no}-{d}"
                for d in (r.doc_id for r in generate_sequences(
                    spark, 20, seed=1000 * seed + batch_no, max_tok=8
                ).select("doc_id").collect())
            ]
            for name in sorted(extras):
                val = float(batch_no) if schema_types[name] == "double" else batch_no
                for d in new_ids:
                    extras[name][d] = val
            for other in extras:
                for d in new_ids:
                    extras[other].setdefault(d, None)
            doc_ids.extend(new_ids)

        # invariant check after EVERY op: the scan matches the model
        out = t.scan()
        cols = set(out.columns)
        assert cols == set(BASE_COLS) | set(extras) | {
            "_olake_id", "_olake_insert_time", "_cdc_deleted_at"
        }, (sorted(cols), sorted(extras))
        got = {
            r["doc_id"]: r
            for r in out.select("doc_id", *sorted(extras)).collect()
        }
        assert len(got) == len(doc_ids)
        for name, by_doc in extras.items():
            for d, want in by_doc.items():
                g = got[d][name]
                assert (g is None and want is None) or g == want, (
                    name, d, g, want
                )
    return len(extras)


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_random_ddl_walk_matches_model(spark, tmp_path, seed):
    _run_walk(spark, tmp_path, seed)
