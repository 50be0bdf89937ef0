"""JSON-schema generation by dataclass reflection.

The reference's only tested component is its jsonschema generator: it
reflects Go structs (AST + type loader), turns fields into schema
properties, extracts doc comments into descriptions, and auto-creates
``$defs`` for nested struct types
(/root/reference/jsonschema/generator/generator.go, tested in
generator_test.go; used by the ``spec`` command to publish each
driver's config schema). This is the Python analog: a dataclass IS the
reflected truth — ``typing`` hints map to JSON-schema types,
``field(metadata={"description": ...})`` carries the doc comment,
fields without defaults are ``required``, nested dataclasses become
``$defs`` referenced by ``$ref`` (the reference's AutoCreateDefs
behavior), ``Literal`` becomes ``enum``, ``Optional[T]`` admits null.

The CLI's ``spec`` command generates its schema from the JobConfig
dataclass below, so the published spec can never drift from the config
the code actually consumes.
"""

from __future__ import annotations

import dataclasses
import typing
from dataclasses import dataclass, field

_SCALARS = {str: "string", int: "integer", float: "number", bool: "boolean"}


def _type_schema(tp, defs: dict, auto_defs: bool) -> dict:
    import types as _types

    origin = typing.get_origin(tp)
    # typing.Optional/Union AND the PEP-604 `T | None` runtime type
    if origin is typing.Union or origin is _types.UnionType:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        nullable = len(args) != len(typing.get_args(tp))
        inner = _type_schema(args[0], defs, auto_defs) if len(args) == 1 else {
            "anyOf": [_type_schema(a, defs, auto_defs) for a in args]
        }
        if nullable and "type" in inner and isinstance(inner["type"], str):
            inner = {**inner, "type": [inner["type"], "null"]}
        return inner
    if origin is typing.Literal:
        return {"enum": list(typing.get_args(tp))}
    if origin in (list, tuple):
        args = typing.get_args(tp)
        item = _type_schema(args[0], defs, auto_defs) if args else {}
        return {"type": "array", "items": item}
    if origin is dict:
        args = typing.get_args(tp)
        extra = _type_schema(args[1], defs, auto_defs) if len(args) == 2 else True
        return {"type": "object", "additionalProperties": extra}
    if dataclasses.is_dataclass(tp):
        if auto_defs:
            name = tp.__name__
            if name not in defs:
                defs[name] = {}  # cycle guard: claim the slot first
                defs[name] = _object_schema(tp, defs, auto_defs)
            return {"$ref": f"#/$defs/{name}"}
        return _object_schema(tp, defs, auto_defs)
    if tp in _SCALARS:
        return {"type": _SCALARS[tp]}
    return {}  # Any / unknown: unconstrained


def _object_schema(cls, defs: dict, auto_defs: bool) -> dict:
    hints = typing.get_type_hints(cls)
    props: dict = {}
    required: list[str] = []
    for f in dataclasses.fields(cls):
        sch = _type_schema(hints[f.name], defs, auto_defs)
        desc = f.metadata.get("description")
        if desc:
            sch = {**sch, "description": desc}
        if f.default is not dataclasses.MISSING:
            if f.default is not None:
                sch = {**sch, "default": f.default}
        elif f.default_factory is dataclasses.MISSING:  # type: ignore[misc]
            required.append(f.name)
        props[f.name] = sch
    out: dict = {"type": "object", "properties": props}
    if required:
        out["required"] = required
    doc = (cls.__doc__ or "").strip().splitlines()
    if doc and not doc[0].startswith(cls.__name__ + "("):
        # a real docstring, not the dataclass-generated signature
        out["description"] = doc[0]
    return out


def generate_schema(cls, title: str | None = None) -> dict:
    """Reflect a dataclass into a JSON schema (draft-07 shape, matching
    the reference generator's SpecVersion default)."""
    defs: dict = {}
    root = _object_schema(cls, defs, auto_defs=True)
    out = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": title or cls.__name__,
        **root,
    }
    if defs:
        out["$defs"] = defs
    return out


def _f(description: str, default=dataclasses.MISSING, **kw):
    if default is dataclasses.MISSING and "default_factory" not in kw:
        return field(metadata={"description": description}, **kw)
    return field(default=default, metadata={"description": description}, **kw)


@dataclass
class StreamConfig:
    """One configured stream inside a catalog job (selected_streams)."""

    name: str = _f("stream name")
    namespace: str = _f("stream namespace", default="default")
    source: str | None = _f("parquet file/dir or jsonl path", default=None)
    sync_mode: typing.Literal["full_refresh", "incremental", "cdc"] = _f(
        "how this stream syncs", default="full_refresh"
    )
    cursor_field: str | None = _f("cursor column (incremental)", default=None)
    feed: str | None = _f("CDC json-lines dir (cdc)", default=None)
    partition_regex: str | None = _f(
        "write-path template /{col,'fallback',granularity}/", default=None
    )
    split_col: str | None = _f("chunked-backfill split column", default=None)


@dataclass
class JobConfig:
    """olake_spark job config — the spec the CLI consumes."""

    dest: str = _f("table root to create/append")
    source: str | None = _f("parquet dir or table root", default=None)
    mode: typing.Literal["full_refresh", "incremental", "cdc"] = _f(
        "sync mode", default="full_refresh"
    )
    cursor_col: str | None = _f("cursor (mode=incremental)", default=None)
    feed: str | None = _f("CDC json-lines dir (mode=cdc)", default=None)
    catalog: str | None = _f("multi-stream job spec path", default=None)
    streams: list[StreamConfig] = _f(
        "configured streams (catalog mode)", default_factory=list
    )
    partition_regex: str | None = _f(
        "write-path template /{col,'fallback',granularity}/", default=None
    )
    target_file_bytes: int = _f("output file size target", default=134217728)
    cpus: int = _f("local parallelism", default=8)


def job_spec() -> dict:
    return generate_schema(JobConfig, title="olake_spark job config")
