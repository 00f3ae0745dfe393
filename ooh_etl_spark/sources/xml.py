"""OOH XML compilation source (S1/S2, index.js:186,136).

The reference loads the whole file into one in-memory DOM; here Spark's
native XML source splits on ``rowTag=occupation`` so the scan is
distributed (one row per occupation, readable in parallel from any
number of files at 100 TB). The schema is DECLARED, not inferred —
inference would mis-type free text (and the reference's schema is
implicit anyway; SURVEY.md §1.3 makes it explicit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ooh_etl_spark.functions.html import (
    WORK_SCHEDULES_PATTERN,
    cells_to_map,
    extract_after_heading,
    extract_trimmed_list,
    pay_map,
    pay_text,
    qualities_map,
    xpath_concat,
    xpath_match_count,
)


def _qf(*fields: str) -> T.StructType:
    return T.StructType([T.StructField(f, T.StringType()) for f in fields])


#: Everything is a string at the source, mirroring the reference where
#: casts happen in expressions (index.js:151-152), not in the scan.
OCCUPATION_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("qf_median_pay_annual", _qf("value")),
        T.StructField("qf_median_pay_hourly", _qf("value")),
        T.StructField("qf_entry_level_education", _qf("value")),
        T.StructField("qf_work_experience", _qf("value")),
        T.StructField("qf_on_the_job_training", _qf("value")),
        T.StructField("qf_number_of_jobs", _qf("value")),
        T.StructField("qf_employment_outlook", _qf("description", "value")),
        T.StructField("qf_employment_openings", _qf("value")),
        T.StructField("summary_what_they_do", T.StringType()),
        T.StructField("summary_how_to_become_one", T.StringType()),
        T.StructField("summary_work_environment", T.StringType()),
        T.StructField("summary_pay", T.StringType()),
        T.StructField("similar_occupations", _qf("section_body")),
        T.StructField("work_environment", _qf("section_body")),
        T.StructField("how_to_become_one", _qf("section_body")),
    ]
)


def read_occupations(spark: SparkSession, path: str) -> DataFrame:
    """S1: scan the OOH compilation, one row per <occupation>."""
    return (
        spark.read.format("xml")
        .option("rowTag", "occupation")
        .schema(OCCUPATION_SCHEMA)
        .load(path)
    )


def _masked(col: Column, title: Column) -> Column:
    """P2 (index.js:146-148): 'Military Careers' rows carry only
    title/workSchedules/importantQualities; other fields become NULL."""
    return F.when(title != "Military Careers", col)


def occupation_records(occ: DataFrame) -> DataFrame:
    """P1 (index.js:138-174): the 18-column record projection.

    The work_environment/how_to_become_one CDATA blocks are referenced
    by several fields; being one ``select``, Catalyst's common-
    subexpression elimination computes each parse once (the reference
    re-parses the same block twice per row — SURVEY.md §4.1).
    """
    title = F.col("title")
    we = F.col("work_environment.section_body")
    htb = F.col("how_to_become_one.section_body")

    def qf(field: str) -> Column:
        return F.col(field)

    return occ.select(
        title.alias("title"),
        extract_after_heading(we, WORK_SCHEDULES_PATTERN, 3).alias("workSchedules"),
        qualities_map(htb).alias("importantQualities"),
        _masked(qf("description"), title).alias("description"),
        # try_cast: ANSI mode is on (Spark 4 default) and a plain cast
        # THROWS on malformed text; NULL is the total analog of the
        # reference's `+'abc' → NaN` coercion (index.js:151-152).
        _masked(qf("qf_median_pay_annual.value").try_cast("double"), title).alias(
            "medianPayAnnual"
        ),
        _masked(qf("qf_median_pay_hourly.value").try_cast("double"), title).alias(
            "medianPayHourly"
        ),
        _masked(qf("qf_entry_level_education.value"), title).alias("education"),
        _masked(qf("qf_work_experience.value"), title).alias("workExperience"),
        _masked(qf("qf_on_the_job_training.value"), title).alias("training"),
        _masked(qf("qf_number_of_jobs.value"), title).alias("numberOfJobs"),
        _masked(qf("qf_employment_outlook.description"), title).alias(
            "employmentOutlook"
        ),
        _masked(qf("qf_employment_outlook.value"), title).alias(
            "employmentOutlookCode"
        ),
        _masked(qf("qf_employment_openings.value"), title).alias(
            "projectedChangeInNumberOfJobs"
        ),
        _masked(xpath_concat(F.col("summary_what_they_do")), title).alias(
            "whatTheyDo"
        ),
        _masked(xpath_concat(F.col("summary_how_to_become_one")), title).alias(
            "howToBecomeOne"
        ),
        _masked(xpath_concat(F.col("summary_work_environment")), title).alias(
            "workEnvironment"
        ),
        _masked(pay_text(F.col("summary_pay")), title).alias("payText"),
        _masked(pay_map(F.col("summary_pay")), title).alias("pay"),
        _masked(
            extract_trimmed_list(F.col("similar_occupations.section_body")), title
        ).alias("similarOccupations"),
        _masked(cells_to_map(we), title).alias("topIndustries"),
        # E4 warn path (index.js:33-35) as derived columns: match counts
        # for the three cdataXpath fields (≠ 1 → the reference logs).
        _masked(xpath_match_count(F.col("summary_what_they_do")), title).alias(
            "whatTheyDo_matches"
        ),
    )


def long_quality_filter(records: DataFrame, min_len: int = 26) -> DataFrame:
    """F1 (index.js:177): EXISTS over map keys. NULL-safe: rows with a
    NULL map are dropped (the reference would throw; SURVEY §7.3.1).

    The predicate is pinned above the record projection
    (tables.non_pushable): pushed down, it would re-run the full
    qualities parse single-threaded in the XML scan stage."""
    from ooh_etl_spark.tables import non_pushable

    return records.filter(
        non_pushable(
            F.exists(
                F.map_keys("importantQualities"), lambda k: F.length(k) > min_len
            )
        )
    )


def report_lines(records: DataFrame) -> DataFrame:
    """K1 (index.js:178): the formatted sink line. Integral doubles are
    rendered without the trailing '.0' to match JS number→string."""
    salary = F.regexp_replace(F.col("medianPayAnnual").cast("string"), r"\.0$", "")
    return records.select(
        "title",
        F.format_string(
            "Job: %s Salary: %s Growth Rating: %s",
            F.col("title"),
            salary,
            F.col("employmentOutlookCode"),
        ).alias("line"),
    )
