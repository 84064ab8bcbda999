"""Survival-matrix transform.

Parity with /root/reference/xena_gdc_etl/xena_dataset.py:1417
``GDCSurvivalset``: the per-case survival record (censored flag + time) is
flipped to an OS event indicator, renamed to the Xena survival schema, and
broadcast onto every sample of the case via a case→sample inner join
(xena_dataset.py:1520 ``transform``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def survival_matrix(
    survival: DataFrame,
    case_samples: DataFrame,
    case_key: str,
    censored_col: str = "censored",
    time_col: str = "time",
    patient_col: str = "submitter_id",
    sample_col: str = "sample",
) -> DataFrame:
    """Build the per-sample survival matrix.

    OS = int(NOT censored) (xena_dataset.py:1561 ``(~OS).map(int)``);
    OS.time = time; _PATIENT = case submitter id; one output row per sample
    of the case (inner join, xena_dataset.py:1577-1581).

    Scale: the survival table is per-case (small next to per-sample data);
    Spark broadcasts it onto the sample map — no shuffle of the big side.
    """
    surv = survival.select(
        F.col(case_key),
        (~F.col(censored_col)).cast("int").alias("OS"),
        F.col(time_col).alias("OS_time"),
        F.col(patient_col).alias("_PATIENT"),
    )
    samples = case_samples.select(F.col(case_key), F.col(sample_col))
    return samples.join(surv, on=case_key, how="inner").select(
        sample_col, "OS", "OS_time", "_PATIENT"
    )
