"""Partition pruning: a filter on the partition column must appear as
PartitionFilters on the scan and the scan must read only matching
directories."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.plans.explain import formatted_plan
from alexandria_pipeline_spark.sources.partitioned import (
    read_day,
    write_partitioned_by_day,
)

from tests.conftest import SF_SMOKE


def test_partition_pruning(spark):
    e = load_table(spark, SF_SMOKE, "events")
    out = tempfile.mkdtemp(prefix="apspark_part_")
    write_partitioned_by_day(e, "ts", out)

    days = sorted(p.rsplit("=", 1)[1] for p in glob.glob(f"{out}/event_day=*"))
    assert len(days) > 5  # events span ~30 days

    one = read_day(spark, out, days[0])
    plan = formatted_plan(one)
    # the day predicate is a PartitionFilter, not a data Filter
    assert "PartitionFilters" in plan
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("event_day" in ln for ln in pf_lines), pf_lines

    # row parity with the unpartitioned filter
    expected = e.filter(F.date_format("ts", "yyyy-MM-dd") == days[0]).count()
    assert one.count() == expected > 0
