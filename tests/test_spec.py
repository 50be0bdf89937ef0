"""Dataclass-reflection JSON-schema generator — the analog of the
reference's only tested component (jsonschema/generator/generator_test.go):
scalar/array/map/nested-struct fields, descriptions from metadata,
required detection, $defs auto-creation, enum from Literal, null from
Optional, and the published CLI spec staying in lockstep with JobConfig."""

import dataclasses
import json
import typing
from dataclasses import dataclass, field

from olake_spark.spec import JobConfig, generate_schema, job_spec


@dataclass
class Inner:
    """an inner thing"""

    x: int = field(metadata={"description": "the x"})
    tag: str = "t"


@dataclass
class Outer:
    name: str
    inner: Inner = field(default_factory=Inner)
    items: list[int] = field(default_factory=list)
    lookup: dict[str, float] = field(default_factory=dict)
    mode: typing.Literal["a", "b"] = "a"
    note: str | None = None
    ratio: float = 0.5
    on: bool = True
    nested_list: list[Inner] = field(default_factory=list)


def test_scalar_array_map_enum_null_mapping():
    s = generate_schema(Outer)
    p = s["properties"]
    assert p["name"] == {"type": "string"}
    assert p["items"] == {"type": "array", "items": {"type": "integer"}}
    assert p["lookup"] == {
        "type": "object", "additionalProperties": {"type": "number"}
    }
    assert p["mode"]["enum"] == ["a", "b"] and p["mode"]["default"] == "a"
    assert p["note"]["type"] == ["string", "null"]
    assert p["ratio"] == {"type": "number", "default": 0.5}
    assert p["on"] == {"type": "boolean", "default": True}


def test_required_is_fields_without_defaults():
    s = generate_schema(Outer)
    assert s["required"] == ["name"]
    inner = s["$defs"]["Inner"]
    assert inner["required"] == ["x"]


def test_nested_dataclasses_become_defs_with_refs():
    s = generate_schema(Outer)
    assert s["properties"]["inner"] == {"$ref": "#/$defs/Inner"}
    assert s["properties"]["nested_list"]["items"] == {"$ref": "#/$defs/Inner"}
    assert list(s["$defs"]) == ["Inner"]  # created once, referenced twice
    assert s["$defs"]["Inner"]["description"] == "an inner thing"


def test_descriptions_come_from_field_metadata():
    s = generate_schema(Outer)
    assert s["$defs"]["Inner"]["properties"]["x"]["description"] == "the x"


def test_cycle_guard():
    @dataclass
    class Node:
        val: int = 0
        # typing as string ref resolves through get_type_hints
        child: typing.Optional["Node"] = None

    # must terminate and emit one self-referential def
    Node.__annotations__["child"] = typing.Optional[Node]
    s = generate_schema(Node)
    assert s["properties"]["child"]["$ref"] == "#/$defs/Node"


def test_cli_spec_reflects_jobconfig_exactly(capsys):
    from olake_spark.cli import main

    assert main(["spec"]) == 0
    msg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    spec = msg["spec"]
    assert msg["type"] == "SPEC"
    assert set(spec["properties"]) == {
        f.name for f in dataclasses.fields(JobConfig)
    }
    assert spec["required"] == ["dest"]
    assert spec["properties"]["mode"]["enum"] == [
        "full_refresh", "incremental", "cdc"
    ]
    assert spec["properties"]["streams"]["items"] == {
        "$ref": "#/$defs/StreamConfig"
    }
    # schema is pure json (the published artifact)
    json.dumps(job_spec())
