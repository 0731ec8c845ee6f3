"""Column-level helpers shared by operators and queries."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key_col: str, buckets: int, salt_mod: int = 8) -> DataFrame:
    """Repartition by (hash(key), salt) so a hot key's rows spread over
    ``salt_mod`` partitions. Use for key-agnostic stages (per-row transforms);
    per-key stateful scans must NOT be salted (state is sequential per key)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key_col), F.monotonically_increasing_id()), F.lit(salt_mod))
    )
    return salted.repartition(buckets, F.col(key_col), F.col("_salt")).drop("_salt")


def bucket_key(key_col: str, buckets: int):
    """Deterministic bucket id for co-located joins/writes."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets))
