"""Sample custom transforms — template for user plugins.

Parity with the reference's example custom (reference:
silver/customs/custom_sales_rules.py:4-49): null/NaN-safe discount
rule with idempotent re-application guard; plus an image-domain
example for the graft."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medalforge_lakehouse_data_spark.customs.sdk import custom


@custom
def apply_discount_if_high_value(
    df: DataFrame, percent: float, threshold: float
) -> DataFrame:
    """amount >= threshold → amount*(1-pct/100) + discount_applied flag;
    guarded so re-running does not double-discount."""
    if "discount_applied" not in df.columns:
        df = df.withColumn("discount_applied", F.lit(False))
    amt = F.col("amount")
    eligible = (
        amt.isNotNull()
        & ~F.isnan(amt.cast("double"))
        & (amt >= F.lit(threshold))
        & ~F.col("discount_applied")
    )
    df = df.withColumn(
        "amount",
        F.when(eligible, amt * (1 - F.lit(percent) / 100.0)).otherwise(amt),
    )
    return df.withColumn(
        "discount_applied", F.when(eligible, F.lit(True)).otherwise(F.col("discount_applied"))
    )


@custom
def flag_small_images(df: DataFrame, min_pixels: int = 1024) -> DataFrame:
    """Graft-domain sample: mark images below a pixel-count floor."""
    return df.withColumn(
        "small_image", (F.col("w") * F.col("h")) < F.lit(min_pixels)
    )
