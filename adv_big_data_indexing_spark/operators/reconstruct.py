"""OP-C1 reconstruction — shredded tables → the original nested documents.

The reference rebuilds a document by recursively following
``{objectType, objectId}`` references with one Redis/ES point lookup per
child (reconstructObject, src/utils/elasticSearch.ts:257-300) — an N+1
pattern. Spark-first this is a static view: two equi-joins plus a
``collect_list(struct(...))`` group-back, set-oriented over the whole
collection at once.

Determinism: array children are sorted by objectId (array_sort on a
struct whose FIRST field is objectId), so reconstruct(shred(x)) is
comparable by value and ETags are stable — the property the reference
implicitly relies on when it md5-compares reconstructed docs
(ObjectExists, elasticSearch.ts:224-225).

Scale: both joins are on the parent key; with the child tables
partitioned/bucketed by parent_key (the reference's ES routing trick,
elasticSearch.ts:135-147) they are co-partitioned and shuffle-free.
The groupBy collect_list shuffles only the planservice rows once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _costshare_struct(prefix: str = "") -> Column:
    return F.struct(
        F.col(f"{prefix}objectId").alias("objectId"),
        F.col(f"{prefix}deductible").alias("deductible"),
        F.col(f"{prefix}_org").alias("_org"),
        F.col(f"{prefix}copay").alias("copay"),
        F.col(f"{prefix}objectType").alias("objectType"),
    )


def reconstruct(tables: dict[str, DataFrame]) -> DataFrame:
    """Rebuild full nested plan documents from shredded tables."""
    plans = tables["plans"]
    cs = tables["membercostshares"]
    ps = tables["planservices"]
    sv = tables["services"]

    # level 2: planservice + its grandchildren (service, costshare)
    svc_nested = (
        ps.alias("p")
        .join(
            sv.select(
                F.col("parent_key").alias("sv_parent"),
                F.struct("_org", "objectId", "objectType", "name").alias("linkedService"),
            ),
            F.col("p.id") == F.col("sv_parent"),
            "left",
        )
        .join(
            cs.where(F.col("rel_name") == "planservice_membercostshare")
            .select(
                F.col("parent_key").alias("cs_parent"),
                _costshare_struct().alias("planserviceCostShares"),
            ),
            F.col("p.id") == F.col("cs_parent"),
            "left",
        )
        .select(
            F.col("p.parent_key").alias("plan_key"),
            F.struct(
                # objectId FIRST: array_sort orders struct elements
                # lexicographically by field order, giving objectId order.
                F.col("p.objectId").alias("objectId"),
                F.col("linkedService"),
                F.col("planserviceCostShares"),
                F.col("p._org").alias("_org"),
                F.col("p.objectType").alias("objectType"),
            ).alias("lps"),
        )
    )
    svc_arrays = svc_nested.groupBy("plan_key").agg(
        F.array_sort(F.collect_list("lps")).alias("linkedPlanServices")
    )

    plan_cs = cs.where(F.col("rel_name") == "plan_membercostshare").select(
        F.col("parent_key").alias("cs_plan_key"),
        _costshare_struct().alias("planCostShares"),
    )

    return (
        plans.alias("pl")
        .join(plan_cs, F.col("pl.id") == F.col("cs_plan_key"), "left")
        .join(svc_arrays, F.col("pl.id") == F.col("plan_key"), "left")
        .select(
            F.col("pl.id").alias("id"),
            F.col("pl.objectId").alias("objectId"),
            F.col("pl.objectType").alias("objectType"),
            F.col("pl._org").alias("_org"),
            F.col("pl.planType").alias("planType"),
            F.col("pl.creationDate").alias("creationDate"),
            F.col("planCostShares"),
            F.coalesce(
                F.col("linkedPlanServices"),
                F.array().cast("array<struct<objectId:string,"
                               "linkedService:struct<_org:string,objectId:string,objectType:string,name:string>,"
                               "planserviceCostShares:struct<objectId:string,deductible:double,_org:string,copay:double,objectType:string>,"
                               "_org:string,objectType:string>>"),
            ).alias("linkedPlanServices"),
        )
    )


def etag(doc_struct: Column) -> Column:
    """OP-F2/G5: content-addressed version — md5 of the canonical JSON of
    the *reconstructed* document (generateEtag, jwtAuth.ts:71-73; computed
    over the joined object, apiLogicForCRUD.ts:75)."""
    return F.md5(F.to_json(doc_struct))


def with_etag(reconstructed: DataFrame) -> DataFrame:
    payload = F.struct(*[F.col(c) for c in reconstructed.columns if c != "id"])
    return reconstructed.withColumn("etag", etag(payload))
