"""Schema system: declared constraints + write-time enforcement (K7/K8).

The reference declares 6 uniqueness constraints and ~20 BTREE indexes
up-front (/root/reference/pkg/schema/schema.go:38-203) and offers
create/drop/validate/info entry points (:206-263, :343-488). Spark has
no server-side index: uniqueness is enforced at write time
(operators/upsert.assert_unique) and the index list maps to physical
layout hints (partition nodes by label / edges by type, Z-ORDER-style
sort on the composite keys) that Catalyst's pruning exploits.

This module keeps that contract explicit: a declarative constraint
registry, validate/info over any PropertyGraph, and the engine-level
database info (K8 — client.go:277-294's dbms.components analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from codegraph_spark.graph import PropertyGraph
from codegraph_spark.operators.upsert import UniquenessViolation, assert_unique


@dataclass(frozen=True)
class UniqueConstraint:
    label: str          # node label the constraint applies to
    prop: str           # property column that must be unique per label


#: the reference's six uniqueness constraints (schema.go:41-79), stated
#: against the recast graph's columns. ``key`` is the business key the
#: surrogate node id is minted from (SURVEY §1.6 elementId mapping).
DEFAULT_CONSTRAINTS: tuple[UniqueConstraint, ...] = (
    UniqueConstraint("Part", "symbol"),       # Symbol.symbol IS UNIQUE
    UniqueConstraint("Region", "key"),        # Service.name
    UniqueConstraint("Nation", "key"),        # Module.fqn
    UniqueConstraint("Customer", "key"),      # File.path
    UniqueConstraint("Supplier", "key"),      # Class.fqn
    UniqueConstraint("Order", "key"),         # Interface.fqn
)


@dataclass
class SchemaManager:
    """create / drop / validate / info — schema.go:206-263 parity."""

    constraints: list[UniqueConstraint] = field(
        default_factory=lambda: list(DEFAULT_CONSTRAINTS)
    )

    def create_constraint(self, label: str, prop: str) -> None:
        c = UniqueConstraint(label, prop)
        if c not in self.constraints:
            self.constraints.append(c)

    def drop_constraint(self, label: str, prop: str) -> None:
        self.constraints = [
            c for c in self.constraints if (c.label, c.prop) != (label, prop)
        ]

    def apply(self, graph: PropertyGraph) -> dict:
        """CreateSchema (schema.go:206-263): declare every constraint
        against the live graph. Neo4j fails creation when existing data
        violates a constraint — the Spark analog checks each declared
        key against the graph and reports created vs failed, plus the
        physical-layout hints that stand in for the BTREE indexes
        (schema.go:266-340)."""
        created: list[str] = []
        failed: list[str] = []
        skipped: list[str] = []
        cols = set(graph.nodes.columns)
        for c in self.constraints:
            desc = f"{c.label}.{c.prop} IS UNIQUE"
            if c.prop not in cols:
                skipped.append(f"{desc} (column absent)")
                continue
            scoped = graph.nodes.filter(
                (F.col("label") == c.label) & F.col(c.prop).isNotNull()
            )
            try:
                assert_unique(scoped, [c.prop], label=f"{c.label}.{c.prop}")
                created.append(desc)
            except UniquenessViolation as e:
                failed.append(str(e))
        return {
            "created": created,
            "failed": failed,
            "skipped": skipped,
            "indexes": {
                "nodes": "partitionBy(label) + bucketBy(id)",
                "edges": "partitionBy(type) + bucketBy(src)",
            },
        }

    def drop_all(self) -> dict:
        """DropSchema (schema.go:343-407): clear the declared registry."""
        dropped = [f"{c.label}.{c.prop} IS UNIQUE" for c in self.constraints]
        self.constraints = []
        return {"dropped": dropped}

    def validate(self, graph: PropertyGraph) -> dict:
        """ValidateSchema (schema.go:443-488): every declared constraint
        holds on the live graph; referential integrity of edges."""
        failures: list[str] = []
        skipped: list[str] = []
        cols = set(graph.nodes.columns)
        for c in self.constraints:
            # properties are open-schema (§1.5): a constraint on a
            # column this graph doesn't carry is vacuously satisfied
            # (Neo4j likewise validates declared constraints against
            # whatever properties exist) — report it, don't crash.
            if c.prop not in cols:
                skipped.append(f"{c.label}.{c.prop} (column absent)")
                continue
            scoped = graph.nodes.filter(
                (F.col("label") == c.label) & F.col(c.prop).isNotNull()
            )
            try:
                assert_unique(scoped, [c.prop], label=f"{c.label}.{c.prop}")
            except UniquenessViolation as e:
                failures.append(str(e))
        # orphan edges (J9 anti-join shape): every src/dst must resolve
        ids = graph.nodes.select("id")
        orphans = (
            graph.edges.select(F.col("src").alias("id"))
            .unionByName(graph.edges.select(F.col("dst").alias("id")))
            .join(ids, "id", "left_anti")
            .limit(1)
            .count()
        )
        if orphans:
            failures.append("edges reference node ids not present in nodes")
        return {"valid": not failures, "failures": failures, "skipped": skipped}

    def info(self, graph: PropertyGraph) -> dict:
        """GetSchemaInfo (schema.go:410-440): labels, edge types,
        constraint registry, physical-layout hints."""
        labels = [r["label"] for r in
                  graph.nodes.select("label").distinct().orderBy("label").collect()]
        etypes = [r["type"] for r in
                  graph.edges.select("type").distinct().orderBy("type").collect()]
        return {
            "labels": labels,
            "relationship_types": etypes,
            "constraints": [f"{c.label}.{c.prop} IS UNIQUE" for c in self.constraints],
            "layout_hints": {
                "nodes": "partitionBy(label)",
                "edges": "partitionBy(type)",
            },
        }


def database_info(spark: SparkSession) -> dict:
    """GetDatabaseInfo (client.go:277-294): engine name/version/edition."""
    return {
        "name": "codegraph-spark",
        "engine": "Apache Spark",
        "version": spark.version,
        "master": spark.sparkContext.master,
        "tables": [t.name for t in spark.catalog.listTables()],
    }
