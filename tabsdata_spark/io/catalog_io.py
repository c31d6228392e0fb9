"""Iceberg / Glue catalog publish (reference:
client/td-sdk/tabsdata/_io/outputs/file_outputs.py:93-391,1610-1740 —
export Parquet, then register it in AWS Glue as an Iceberg table via
pyiceberg).

Spark-first design: instead of exporting files and registering them
out-of-band, write *through* Spark's native Iceberg catalog integration —
`spark.sql.catalog.<name>` config + `df.writeTo("<catalog>.<ns>.<table>")`.
The catalog (Glue, Hive, Hadoop, REST) is a config concern, not a code
path: the same `writeTo` serves all of them, and Iceberg handles
snapshots, hidden partitioning, and atomic commits — the engine-native
replacement for the reference's export-then-register two-step.

Gated: the iceberg-spark-runtime jar is not in this container; publish()
raises a clear error telling the operator what to add instead of failing
inside the JVM.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: spark-conf template for an AWS Glue-backed Iceberg catalog; `warehouse`
#: is the S3 root where table data+metadata live.
GLUE_CATALOG_CONF = {
    "spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.{name}.catalog-impl": "org.apache.iceberg.aws.glue.GlueCatalog",
    "spark.sql.catalog.{name}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
    "spark.sql.catalog.{name}.warehouse": "{warehouse}",
}

#: local/filesystem-backed variant (tests, dev): HadoopCatalog keeps table
#: metadata under the warehouse dir itself, no external service.
HADOOP_CATALOG_CONF = {
    "spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.{name}.type": "hadoop",
    "spark.sql.catalog.{name}.warehouse": "{warehouse}",
}


def catalog_confs(name: str, warehouse: str, kind: str = "glue") -> dict[str, str]:
    """Render the spark-conf map registering an Iceberg catalog `name`."""
    template = GLUE_CATALOG_CONF if kind == "glue" else HADOOP_CATALOG_CONF
    return {k.format(name=name): v.format(name=name, warehouse=warehouse)
            for k, v in template.items()}


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@dataclass
class IcebergCatalogDestination:
    """Publish a table into an Iceberg catalog (Glue by default).

    `catalog` is the Spark catalog name; confs from `catalog_confs()` must
    be on the session (catalog registration happens at session level, like
    the reference's server-held Glue credentials).  `mode`:
    `create_or_replace` (snapshot-isolated full refresh) or `append`.
    `partition_by` uses Iceberg hidden partitioning — at 100 TB partition
    on coarse, low-cardinality transforms (days(ts), bucket(N, key)).
    """

    catalog: str
    namespace: str
    table: str
    mode: str = "create_or_replace"
    partition_by: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)

    def publish(self, df: DataFrame, spark: SparkSession | None = None) -> str:
        spark = spark or df.sparkSession
        if not _iceberg_available(spark):
            raise RuntimeError(
                "Iceberg catalog publish needs the iceberg-spark-runtime jar "
                "on the Spark classpath (e.g. spark.jars.packages="
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>) "
                f"plus catalog confs: {catalog_confs(self.catalog, '<warehouse>')}")
        ident = f"{self.catalog}.{self.namespace}.{self.table}"
        writer = df.writeTo(ident)
        for k, v in self.properties.items():
            writer = writer.tableProperty(k, v)
        if self.partition_by:
            from pyspark.sql import functions as F
            writer = writer.partitionedBy(*[F.expr(p) for p in self.partition_by])
        if self.mode == "append":
            writer.append()
        elif self.mode == "create_or_replace":
            writer.createOrReplace()
        else:
            raise ValueError(f"unknown mode {self.mode!r}")
        return ident
