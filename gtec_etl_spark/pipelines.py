"""End-to-end ETL pipeline — the reference's bin/gtex_v7_to_dats.py
lifecycle (SURVEY.md §3.1) composed from the engine's building blocks:

  validated sources (S1/S2) → fail-fast constraint pass → derived-key
  sample→subject linkage (J1) with dangling-FK audit → restricted-merge
  with conflict check (J2) → consent StudyGroups (A1) with count
  reconciliation (A2) → JSON-LD document emission (K1) → TSV dump (K3)
  → checksummed bag (K4).

Everything before the final writes is lazy DataFrame lineage — the "plan"
the reference encodes as a Python call graph (SURVEY.md §3) is here a
single Catalyst plan per output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gtec_etl_spark.operators import joins as J
from gtec_etl_spark.sinks import jsonld
from gtec_etl_spark.sinks.bdbag import make_bag
from gtec_etl_spark.sinks.tabular import write_tsv_dump
from gtec_etl_spark.sources import validated

SUBJECT_SPEC = validated.TableSpec(
    columns=[
        validated.ColumnSpec("SUBJID", regex=r"^GTEX-[A-Z0-9]+$", empty_ok=False),
        validated.ColumnSpec("SEX", integer_cv={1: "male", 2: "female"}),
        validated.ColumnSpec("AGE", cv=["20-29", "30-39", "40-49", "50-59", "60-69"]),
    ],
    primary_key=["SUBJID"],
)

SAMPLE_SPEC = validated.TableSpec(
    columns=[
        validated.ColumnSpec("SAMPID", regex=r"^GTEX-[A-Z0-9]+-\d+$", empty_ok=False),
        validated.ColumnSpec("SMTS", empty_ok=False),
        validated.ColumnSpec("SMRIN", dtype="double"),
    ],
    primary_key=["SAMPID"],
)

RESTRICTED_SPEC = validated.TableSpec(
    columns=[
        validated.ColumnSpec("SUBJID", regex=r"^GTEX-[A-Z0-9]+$", empty_ok=False),
        validated.ColumnSpec("CONSENT", regex=r"^\d+$", empty_ok=False),
        validated.ColumnSpec("AGE", cv=["20-29", "30-39", "40-49", "50-59", "60-69"]),
    ],
    primary_key=["SUBJID"],
)


@dataclass
class EtlResult:
    subjects: DataFrame
    samples: DataFrame
    study_groups: DataFrame
    conflicts: DataFrame
    dangling_samples: DataFrame
    documents: DataFrame


def run_gtex_like_etl(
    spark: SparkSession,
    subjects_tsv: str,
    samples_tsv: str,
    restricted_tsv: str | None = None,
    expected_group_sizes: dict[str, int] | None = None,
) -> EtlResult:
    """Extract + transform. Raises ValidationError on any source-constraint
    violation (the reference's mid-parse fatal, SURVEY.md §7.4)."""
    subjects = validated.read_tsv(spark, subjects_tsv, SUBJECT_SPEC)
    validated.assert_valid(subjects, SUBJECT_SPEC)
    subjects = validated.apply_mappings(subjects, SUBJECT_SPEC)

    samples = validated.read_tsv(spark, samples_tsv, SAMPLE_SPEC)
    validated.assert_valid(samples, SAMPLE_SPEC)
    samples = validated.apply_mappings(samples, SAMPLE_SPEC)

    # J1: derive the subject key from the sample id; audit dangling FKs.
    samples = samples.withColumn(
        "SUBJID", F.regexp_extract("SAMPID", r"^(GTEX-[A-Z0-9]+)", 1)
    )
    dangling = J.dangling_keys(samples, subjects.select("SUBJID"), "SUBJID")
    linked = samples.join(F.broadcast(subjects), "SUBJID")

    conflicts = None
    if restricted_tsv is not None:
        restricted = validated.read_tsv(spark, restricted_tsv, RESTRICTED_SPEC)
        validated.assert_valid(restricted, RESTRICTED_SPEC)
        restricted = validated.apply_mappings(restricted, RESTRICTED_SPEC)
        subjects, conflicts = J.conflict_checked_merge(subjects, restricted, "SUBJID")
    if conflicts is None:
        conflicts = spark.createDataFrame(
            [], "SUBJID string, column string, base_value string, extra_value string"
        )

    # A1 consent StudyGroups with sorted member lists; A2 reconciliation.
    group_key = "CONSENT" if restricted_tsv is not None else "SEX"
    groups = subjects.groupBy(group_key).agg(
        F.count(F.lit(1)).alias("size"),
        F.concat_ws(",", F.sort_array(F.collect_list("SUBJID"))).alias("members"),
    )
    if expected_group_sizes:
        expected = spark.createDataFrame(
            list(expected_group_sizes.items()), f"{group_key} string, expected long"
        )
        bad = (
            groups.join(expected, group_key)
            .filter(F.col("size") != F.col("expected"))
        )
        if bad.take(1):
            raise ValueError(
                f"consent-group size reconciliation failed: {bad.collect()}"
            )

    # K1: one JSON-LD document per study group (deterministic ids, sorted
    # members as @id refs).
    subj_struct = F.struct(
        jsonld.content_id("Material", "SUBJID").alias("@id"),
        F.lit("Material").alias("@type"),
        F.col("SUBJID").alias("name"),
    )
    per_subject = subjects.select(group_key, "SUBJID", subj_struct.alias("s"))
    documents = (
        per_subject.groupBy(group_key)
        .agg(
            jsonld.children_array(
                F.collect_list(jsonld.sorted_children(F.col("SUBJID"), F.col("s")))
            ).alias("members"),
            F.count(F.lit(1)).alias("size"),
        )
        .select(
            F.col(group_key).alias("group"),
            jsonld.to_document(
                F.struct(
                    jsonld.content_id("StudyGroup", group_key).alias("@id"),
                    F.lit("StudyGroup").alias("@type"),
                    F.col(group_key).alias("name"),
                    F.col("size"),
                    F.col("members"),
                )
            ).alias("doc"),
        )
    )

    return EtlResult(
        subjects=subjects,
        samples=linked,
        study_groups=groups,
        conflicts=conflicts,
        dangling_samples=dangling,
        documents=documents,
    )


def export_release(result: EtlResult, out_dir: str, bag_path: str) -> dict:
    """Load phase: TSV dump (K3) + JSON-LD documents (K1) + checksummed
    bag (K4). Returns the bag summary."""
    write_tsv_dump(
        result.samples.select("SUBJID", "SAMPID", "SMTS", "SMRIN", "SEX", "AGE"),
        f"{out_dir}/samples_dump",
        ["SUBJID", "SAMPID"],
        single_file=True,
    )
    jsonld.write_documents(result.documents, f"{out_dir}/documents")
    return make_bag(out_dir, bag_path, {"Source-Organization": "gtec_etl_spark"})
