"""Pipeline orchestration: sequential DAG with failure routing.

Engine equivalent of the reference's Step Functions state machine
(aws-step-function/step-function.json:3-59 — RawBronze ->
BronzeToSilver with Catch -> FailState routing, X1-X3 in SURVEY.md
§2.12). Locally this is a plain runner: steps run in order, a step
failure stops the pipeline and surfaces the error; inputs flow
through as function arguments (the `PreserveInput` Pass state).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..lakehouse import Catalog
from .cdc import bronze_to_silver
from .ingest import ingest_raw_to_bronze


@dataclass
class MedallionPipeline:
    """End-to-end raw -> bronze -> silver pipeline over one warehouse."""

    catalog: Catalog
    namespace: str
    input_path: str | Path
    checkpoint_dir: str | Path
    bronze_table: str = "bronze_orders"
    silver_table: str = "silver_orders"
    key: str | Sequence[str] = "invoiceid"
    order_by: Sequence[str] = ("processed_time", "ingest_seq")
    sep: str = "\t"
    schema: T.StructType | None = None
    silver_schema: T.StructType | None = None
    silver_partition_by: Sequence[str] = ()
    bronze_partition_by: Sequence[str] = ("processed_date",)
    delete_predicate: str | None = None
    steps_run: list[dict] = field(default_factory=list)

    def run_once(self, spark: SparkSession) -> list[dict]:
        """One pipeline pass: ingest then merge. Fail-fast like the
        reference's Catch->FailState (errors propagate)."""
        ckpt = Path(self.checkpoint_dir)
        results = []
        n_files = ingest_raw_to_bronze(
            spark,
            self.catalog,
            self.input_path,
            self.namespace,
            self.bronze_table,
            ckpt / "raw_bronze.json",
            sep=self.sep,
            schema=self.schema,
            partition_by=tuple(self.bronze_partition_by),
        )
        results.append({"step": "RawBronze", "files_ingested": n_files})
        if self.catalog.table_exists(self.namespace, self.bronze_table):
            status = bronze_to_silver(
                spark,
                self.catalog,
                self.namespace,
                self.bronze_table,
                self.silver_table,
                ckpt / "bronze_silver.json",
                key=self.key,
                order_by=self.order_by,
                silver_schema=self.silver_schema,
                silver_partition_by=self.silver_partition_by,
                delete_predicate=self.delete_predicate,
            )
            results.append({"step": "BronzeToSilver", **status})
        self.steps_run.extend(results)
        return results
