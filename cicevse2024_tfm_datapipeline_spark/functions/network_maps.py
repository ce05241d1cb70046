"""F7: the network modality's large label recodes (SURVEY §2.3), sourced
from the reference's notebook-derived mapping tables
(/root/reference/pipelines_network/pipeline_trainingmodels_network.py:65-155).

Spark-first form: each dict becomes a broadcast lookup DataFrame joined
with ``coalesce(mapped, fallback)`` — the scalable twin of pandas
``.map().fillna()``. At any scale the dimension side is tiny, so the join
is a broadcast hash join with zero shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: raw filename-derived label → canonical attack name (45 entries)
LABEL_MAPPING: dict[str, str] = {
    "Charging Benign": "None",
    "MaliciousEV aggressive scan": "aggressive-scan",
    "MaliciousEV os fingerprinting": "os-fingerpriting",
    "MaliciousEV port scan": "TCP-port-scan",
    "MaliciousEV service detection": "service-version-detection",
    "MaliciousEV syn stealth scan": "syn-stealth-scan",
    "MaliciousEV vulnerability scan": "vulnerability-scan",
    "charging Aggressive scan": "aggressive-scan",
    "charging aggressive scan": "aggressive-scan",
    "charging icmp flood": "icmp-flood",
    "charging icmp fragmentation": "icmp-fragmentation",
    "charging os fingerprinting": "os-fingerpriting",
    "charging port scan": "TCP-port-scan",
    "charging portscan": "TCP-port-scan",
    "charging push ack flood": "pshack-flood",
    "charging service detection": "service-version-detection",
    "charging service detection scan": "service-version-detection",
    "charging slowLoris scan": "slowloris-scan",
    "charging syn flood": "syn-flood",
    "charging syn stealth": "syn-stealth-scan",
    "charging synonymous ip": "synonymousIP-flood",
    "charging synonymous ip flood": "synonymousIP-flood",
    "charging tcp flood": "TCP-flood",
    "charging udp flood": "upd-flood",
    "charging vulnerability scan": "vulnerability-scan",
    "idle aggressive scan": "aggressive-scan",
    "idle benign": "None",
    "idle icmp flood": "icmp-flood",
    "idle icmp fragmentation": "icmp-fragmentation",
    "idle os fingerprinting": "os-fingerpriting",
    "idle port scan": "TCP-port-scan",
    "idle portscan": "TCP-port-scan",
    "idle push ack flood": "pshack-flood",
    "idle service detection": "service-version-detection",
    "idle slowloris scan": "slowloris-scan",
    "idle syn flood": "syn-flood",
    "idle syn stealth scan": "syn-stealth-scan",
    "idle synonymous ip": "synonymousIP-flood",
    "idle synonymous ip flood": "synonymousIP-flood",
    "idle tcp flood": "TCP-flood",
    "idle udp flood": "upd-flood",
    "idle vulnerability scan": "vulnerability-scan",
}

#: canonical attack → scenario group
ATTACK_TO_SCENARIO: dict[str, str] = {
    "None": "Benign",
    "TCP-flood": "DoS",
    "TCP-port-scan": "Recon",
    "aggressive-scan": "Recon",
    "icmp-flood": "DoS",
    "icmp-fragmentation": "DoS",
    "os-fingerpriting": "Recon",
    "pshack-flood": "DoS",
    "service-version-detection": "Recon",
    "slowloris-scan": "DoS",
    "syn-flood": "DoS",
    "syn-stealth-scan": "Recon",
    "synonymousIP-flood": "DoS",
    "upd-flood": "DoS",
    "vulnerability-scan": "Recon",
}

#: canonical attack → stable integer id
ATTACK_TO_ID: dict[str, int] = {
    "None": 0,
    "aggressive-scan": 1,
    "icmp-flood": 2,
    "icmp-fragmentation": 3,
    "os-fingerpriting": 4,
    "TCP-port-scan": 5,
    "pshack-flood": 6,
    "service-version-detection": 7,
    "slowloris-scan": 8,
    "syn-flood": 9,
    "syn-stealth-scan": 10,
    "synonymousIP-flood": 11,
    "TCP-flood": 12,
    "upd-flood": 13,
    "vulnerability-scan": 14,
}

SCENARIO_TO_ID: dict[str, int] = {
    "Benign": 0,
    "Recon": 1,
    "DoS": 2,
    "Cryptojacking": 3,
    "Backdoor": 4,
}


def lookup_frame(spark: SparkSession, mapping: dict, key_name: str, value_name: str) -> DataFrame:
    """dict → literal broadcast dimension frame (built JVM-side)."""
    pairs = [
        F.struct(F.lit(k).alias(key_name), F.lit(v).alias(value_name))
        for k, v in mapping.items()
    ]
    return spark.range(1).select(F.explode(F.array(*pairs)).alias("kv")).select(
        f"kv.{key_name}", f"kv.{value_name}"
    )


def apply_mapping(
    df: DataFrame,
    mapping: dict,
    key_col: str,
    out_col: str,
    fallback: Column | None = None,
) -> DataFrame:
    """Left broadcast join + coalesce fallback — the F7 recode. Default
    fallback is the raw key (the reference's ``fillna(raw)``)."""
    spark = df.sparkSession
    dim = lookup_frame(spark, mapping, "__k", out_col)
    joined = df.join(F.broadcast(dim), df[key_col] == dim["__k"], "left").drop("__k")
    fb = fallback if fallback is not None else F.col(key_col)
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), fb))
