"""Tests for the foreign JSON-LD -> triples loader (SURVEY S16).

The registered queries pin parser semantics against DuckDB oracles; these
tests cover what the oracles can't: the physical file round-trip through
the K1 writer, and blank-node determinism.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import functions as F

from gtec_etl_spark.plans.sink_queries import k1_jsonld_study_groups
from gtec_etl_spark.plans.triples_queries import (
    K1_DOC_SCHEMA,
    src_jsonld_roundtrip,
)
from gtec_etl_spark.sinks.jsonld import write_documents
from gtec_etl_spark.sources.jsonld_triples import (
    jsonld_to_triples,
    read_jsonld,
)


def test_file_roundtrip_equals_inline_roundtrip(spark, sf_dir, tmp_path):
    """emit -> write_documents -> spark.read.json -> triples must equal the
    zero-I/O from_json path: the physical writer adds or loses nothing."""
    docs = k1_jsonld_study_groups(spark, sf_dir)
    out = str(tmp_path / "k1docs")
    write_documents(docs, out)
    # write_documents emits one document per line -> JSON Lines read. The
    # read schema is pinned (read.json would widen `size` to the same
    # long anyway; pinning keeps the comparison about CONTENT).
    reloaded = spark.read.schema(K1_DOC_SCHEMA).json(out)
    from_files = {
        (r.s, r.p, r.o) for r in jsonld_to_triples(reloaded).collect()
    }
    inline = {
        (r.s, r.p, r.o) for r in src_jsonld_roundtrip(spark, sf_dir).collect()
    }
    assert from_files == inline
    assert len(inline) > 0


def test_ref_only_objects_add_no_literals(spark):
    """First-occurrence-full-then-ref: a full object and its @id-only ref
    flatten to the same graph as two fulls would minus nothing — refs
    contribute edges only."""
    rows = [
        json.dumps(
            {
                "@id": "e:a",
                "link": {"@id": "e:b", "name": "bee"},
            }
        ),
        json.dumps({"@id": "e:c", "link": {"@id": "e:b"}}),
    ]
    df = spark.read.json(spark.sparkContext.parallelize(rows))
    got = {(r.s, r.p, r.o) for r in jsonld_to_triples(df).collect()}
    assert got == {
        ("e:a", "link", "e:b"),
        ("e:c", "link", "e:b"),
        ("e:b", "name", "bee"),
    }


def test_blank_node_ids_deterministic(spark):
    """An object without @id gets a content-hash blank-node label —
    reproducible across runs/engines (rdflib's bnode labels are not)."""
    doc = {"@id": "e:x", "dim": {"unit": "count"}}
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(doc)]))
    triples = {(r.s, r.p, r.o) for r in jsonld_to_triples(df).collect()}
    expected_bnode = "_:" + hashlib.sha256(b'{"unit":"count"}').hexdigest()[:16]
    assert ("e:x", "dim", expected_bnode) in triples
    assert (expected_bnode, "unit", "count") in triples


def test_mixed_identified_and_anonymous_siblings(spark):
    """Schema-merge hazard (r5 advice): when one document's nested object
    has @id and a sibling document's object at the SAME path omits it, the
    merged schema contains @id so the anonymous node reads as @id=NULL. It
    must still get a deterministic bnode subject and keep its parent edge
    and literals — rdflib assigns a bnode; dropping the node would lose
    triples silently."""
    rows = [
        json.dumps({"@id": "e:a", "dim": {"@id": "e:d", "unit": "mm"}}),
        json.dumps({"@id": "e:b", "dim": {"unit": "count"}}),
    ]
    df = spark.read.json(spark.sparkContext.parallelize(rows))
    assert "@id" in df.schema["dim"].dataType.fieldNames()  # merged schema
    triples = {(r.s, r.p, r.o) for r in jsonld_to_triples(df).collect()}
    assert ("e:a", "dim", "e:d") in triples
    assert ("e:d", "unit", "mm") in triples
    # The anonymous sibling: bnode subject, edge kept, literal kept, and
    # NO null-subject or null-object rows anywhere.
    bnodes = {s for (s, p, o) in triples if p == "unit" and o == "count"}
    assert len(bnodes) == 1
    bnode = bnodes.pop()
    assert bnode.startswith("_:")
    assert ("e:b", "dim", bnode) in triples
    assert all(s is not None and o is not None for (s, _, o) in triples)


def test_nested_list_predicates_encode_position(spark):
    """@list-of-lists flattening: position becomes an indexed predicate,
    recursively; a document WITHOUT the nested field (null after schema
    merge) contributes nothing for it."""
    rows = [
        json.dumps({"@id": "e:1", "grid": [[10, 20], [30]]}),
        json.dumps({"@id": "e:2", "other": "flat"}),
    ]
    df = spark.read.json(spark.sparkContext.parallelize(rows))
    got = {(r.s, r.p, r.o) for r in jsonld_to_triples(df).collect()}
    assert got == {
        ("e:1", "grid[0]", "10"),
        ("e:1", "grid[0]", "20"),
        ("e:1", "grid[1]", "30"),
        ("e:2", "other", "flat"),
    }


def test_triples_flatten_has_no_python_udfs(spark, sf_dir):
    plan = (
        src_jsonld_roundtrip(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
