"""Sample-based JSON discover: drifted/mixed types through the promotion
lattice, nested flatten, timestamp/bool coercion, and an end-to-end sync."""

import json

from pyspark.sql import types as T

from olake_spark.sources.json_discover import discover_json, read_json

LINES = [
    # int id, ts as iso string, nested props, bool flag
    {"id": 1, "ts": "2024-01-01 10:00:00", "flag": "true",
     "props": {"k": 1, "tag": "a"}, "arr": [1, 2]},
    # DRIFT: id becomes float (-> double), new column appears,
    # props.k becomes string (-> promote long|string = string)
    {"id": 2.5, "ts": "2024-02-03T04:05:06", "flag": "no",
     "props": {"k": "x", "tag": "b"}, "extra": 7},
    # nulls carry no type evidence
    {"id": None, "ts": None, "flag": None, "props": {"k": None, "tag": None}},
]


def _write(tmp_path, lines):
    p = str(tmp_path / "stream.jsonl")
    with open(p, "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
    return p


def test_discover_resolves_drifted_schema(spark, tmp_path):
    p = _write(tmp_path, LINES)
    disc = discover_json(spark, p)
    got = {f.name: f.dataType for f in disc.schema.fields}
    assert got["id"] == T.DoubleType()          # long | double -> double
    assert got["ts"] == T.TimestampType()       # iso strings -> timestamp
    assert got["flag"] == T.StringType()        # 'true'/'no' stay strings
    assert got["k"] == T.StringType()           # long | string -> string
    assert got["tag"] == T.StringType()
    assert got["extra"] == T.LongType()         # late new column appended
    assert got["arr"] == T.StringType()         # arrays stringify


def test_discover_samples_file_tail(spark, tmp_path):
    """Drift planted ONLY in the file's final lines (beyond the head
    budget, vanishingly unlikely for the sparse random block) is still
    discovered — the tail block mirrors the reference's $natural -1
    cursor (mon.go:176-179) for append-heavy corpora."""
    lines = [{"id": i, "k": "v"} for i in range(100_000)]
    for i in range(10):
        lines.append({"id": 100_000 + i, "k": "v", "tail_col": "late"})
    p = _write(tmp_path, lines)
    disc = discover_json(spark, p, sample_rows=50)
    got = {f.name: f.dataType for f in disc.schema.fields}
    assert "tail_col" in got and got["tail_col"] == T.StringType()


def test_read_applies_lattice_and_coercion(spark, tmp_path):
    p = _write(tmp_path, LINES)
    disc = discover_json(spark, p)
    rows = {r.id: r for r in read_json(spark, p, disc).collect()}
    assert rows[1.0].ts.year == 2024 and rows[1.0].ts.month == 1
    assert rows[2.5].ts.month == 2 and rows[2.5].ts.hour == 4
    assert rows[1.0].k == "1" and rows[2.5].k == "x"
    assert rows[1.0].arr == "[1,2]" or rows[1.0].arr == '["1","2"]'
    assert rows[2.5].extra == 7
    assert rows[None].ts is None and rows[None].k is None


def test_sync_from_json_source(spark, tmp_path, capsys):
    from olake_spark.cli import main
    from olake_spark.table import Table

    p = _write(tmp_path, LINES * 10)
    dest = str(tmp_path / "tbl")
    assert main(["sync", "--source", p, "--dest", dest, "--cpus", "8"]) == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    msgs = {m["type"]: m for m in out}
    assert msgs["STATE"]["rows"] == 30
    t = Table.load(spark, dest)
    assert t.total_rows() == 30
    df = t.scan()
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.filter("extra = 7").count() == 10


def test_name_collisions_resolve_to_distinct_columns(spark, tmp_path):
    """A struct child whose canon name collides with a top-level key
    must land in its own column (parent-prefixed), not an ambiguous
    duplicate."""
    lines = [
        {"id": 1, "meta": {"id": 7, "x": "a"}},
        {"id": 2, "meta": {"id": 8, "x": "b"}},
    ]
    p = _write(tmp_path, lines)
    disc = discover_json(spark, p)
    names = [f.name for f in disc.schema.fields]
    assert len(names) == len(set(names))
    assert "id" in names and "meta_id" in names and "x" in names
    rows = {r.id: r for r in read_json(spark, p, disc).collect()}
    assert rows[1].meta_id == 7 and rows[2].meta_id == 8
    assert rows[1].x == "a"


# ------------------------------------------------- lattice end-to-end property
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from olake_spark.functions.reformat import (  # noqa: E402
    coerce_to_schema,
    merge_schemas,
    promote_type,
)
from olake_spark.sources.json_discover import _value_type  # noqa: E402

_TS_VALS = ["2024-01-02 03:04:05", "2023-12-31T23:59:59"]
_WORD_VALS = ["zulu", "kilo x", "n/a"]
_value_st = st.one_of(
    st.integers(-1000, 1000),
    st.sampled_from([0.5, -2.25, 3.75]),  # exact binary fractions
    st.sampled_from(_TS_VALS),
    st.sampled_from(_WORD_VALS),
    st.none(),
)
_row_st = st.fixed_dictionaries({"a": _value_st, "b": _value_st})
_batch_st = st.lists(_row_st, min_size=1, max_size=3)


def _expected_types(batches):
    """The engine's semantics, folded in python: per-batch evidence fold
    (string when a batch has no evidence — discover's default), then
    cross-batch promotion (merge_schemas order). Returns
    {key: (final_type, [batch_type, ...])}."""
    out = {}
    for k in ("a", "b"):
        batch_types = []
        for batch in batches:
            ev = [_value_type(r[k]) for r in batch if r[k] is not None]
            if not ev:
                batch_types.append(T.StringType())
                continue
            tt = ev[0]
            for e in ev[1:]:
                tt = promote_type(tt, e)
            batch_types.append(tt)
        final = batch_types[0]
        for x in batch_types[1:]:
            final = promote_type(final, x)
        out[k] = (final, batch_types)
    return out


def _render_as_string(v, batch_type):
    """What a value looks like after landing under its batch's type and
    being string-coerced at read time (promotion through an intermediate
    type keeps the intermediate's lexical form: 0 written as double reads
    back '0.0', a T-separated timestamp reads back space-separated)."""
    if isinstance(batch_type, T.LongType):
        return str(v)
    if isinstance(batch_type, T.DoubleType):
        return str(float(v))
    if isinstance(batch_type, T.TimestampType):
        return v.strip().replace("T", " ")
    if isinstance(v, float):
        return json.dumps(v)
    return str(v)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,  # deterministic examples: CI-stable, still diverse
    suppress_health_check=list(HealthCheck),
)
@given(batches=st.lists(_batch_st, min_size=2, max_size=3))
def test_lattice_end_to_end_random_streams(spark, batches):
    """Property test of the full promotion-lattice pipeline (reference
    typeutils/fields.go:18-39): random mixed-type JSON batches through
    discover -> read -> schema-evolving append -> read-back. Asserts the
    anything|anything = string top rule, the long->double numeric chain
    across FILES WITH DIFFERENT schema_ids, and that no non-null value is
    lost by the read-time coercion of older files."""
    import tempfile

    from olake_spark.table import Table

    tmp = tempfile.mkdtemp(prefix="olake_lattice_")
    t = None
    evolved_any = False
    for bi, batch in enumerate(batches):
        path = f"{tmp}/b{bi}.jsonl"
        with open(path, "w") as f:
            for r in batch:
                f.write(json.dumps(r) + "\n")
        disc = discover_json(spark, path)
        df = read_json(spark, path, disc)
        if t is None:
            t = Table.create(
                spark, f"{tmp}/tbl", schema=df.schema,
                partition_col="a", stats_columns=["a"],
            )
        else:
            evolved, _drift = merge_schemas(t.schema(), disc.schema)
            if evolved != t.schema():
                t.commit("schema-change", new_schema=evolved)
                evolved_any = True
            df = coerce_to_schema(df, t.schema())
        t.append(df)

    expect = _expected_types(batches)
    got = t.scan()
    got_types = {f.name: f.dataType for f in got.schema.fields}
    for k in ("a", "b"):
        assert got_types[k] == expect[k][0], (k, batches)
    # drift across batches <=> multiple schema_ids in the metadata chain
    assert evolved_any == (len(t.metadata["schemas"]) > 1)

    rows = got.collect()
    n_rows = sum(len(b) for b in batches)
    assert len(rows) == n_rows
    for k in ("a", "b"):
        vals = [r[k] for r in rows if r[k] is not None]
        inputs = [r[k] for b in batches for r in b if r[k] is not None]
        # coercion of older schema_ids must not null out any value
        assert len(vals) == len(inputs), (k, batches)
        ft, batch_types = expect[k]
        if isinstance(ft, (T.LongType, T.DoubleType)):
            assert abs(sum(float(v) for v in vals) - sum(float(v) for v in inputs)) < 1e-9
        elif isinstance(ft, T.TimestampType):
            assert all(v.year in (2023, 2024) for v in vals)
        else:
            assert isinstance(ft, T.StringType)
            want = {
                _render_as_string(r[k], batch_types[bi])
                for bi, b in enumerate(batches)
                for r in b
                if r[k] is not None
            }
            assert set(vals) == want, (k, batches)
