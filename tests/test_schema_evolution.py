"""W4/T3: schema evolution — added column and int->long promotion must be
respected by subsequent scans across files written under both schemas
(reference: EvolveSchema writers/parquet/parquet.go:279-290, lattice
typeutils/fields.go:18-39)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.datagen import generate_sequences
from olake_spark.functions.reformat import merge_schemas
from olake_spark.table import Table


def test_add_column_and_promote(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    old = generate_sequences(spark, 400, seed=9, max_tok=32)
    t.append(old.repartition(4))

    # incoming batch: extra nullable lang column, n_tok widened to long
    incoming_schema_fields = []
    for f in t.schema().fields:
        if f.name == "n_tok":
            incoming_schema_fields.append(T.StructField("n_tok", T.LongType(), False))
        else:
            incoming_schema_fields.append(f)
    incoming_schema_fields.append(T.StructField("lang", T.StringType(), True))
    incoming_schema = T.StructType(incoming_schema_fields)

    evolved, drift = merge_schemas(t.schema(), incoming_schema)
    assert drift["new_columns"] == ["lang"]
    assert ("n_tok", "int", "bigint") in drift["promoted"]

    new_rows = (
        generate_sequences(spark, 100, seed=10, max_tok=32)
        .withColumn("n_tok", F.col("n_tok").cast("long"))
        .withColumn("lang", F.lit("en"))
        .select([f.name for f in evolved.fields])
    )
    # evolve schema and write the batch under it, one commit
    files = None
    t.commit("schema-change", new_schema=evolved)
    files = t.write_data_files(new_rows.repartition(2))
    t.commit("append", added=files)

    cur = t.scan()
    assert dict(cur.dtypes)["n_tok"] == "bigint"
    assert "lang" in cur.columns
    assert cur.count() == 500
    # old files surface NULL lang, promoted n_tok
    assert cur.filter(F.col("lang").isNull()).count() == 400
    assert cur.filter(F.col("lang") == "en").count() == 100
    # n_tok values survive the int->long read across both file groups
    assert cur.agg(F.sum("n_tok")).first()[0] == (
        old.agg(F.sum("n_tok")).first()[0]
        + new_rows.agg(F.sum("n_tok")).first()[0]
    )
    # pre-evolution snapshot still reads with the OLD schema
    old_scan = t.scan(snapshot_id=1)
    assert dict(old_scan.dtypes)["n_tok"] == "int"
    assert "lang" not in old_scan.columns
