"""Shared helpers for the per-round scale-evidence scripts (r16 review:
four verbatim copies of the REST shuffle probe had drifted — the r15
timeout fix had reached only two of them)."""

from __future__ import annotations

import json
import urllib.request


def shuffle_write_records(spark) -> int:
    """Total shuffleWriteRecords across every stage of the application,
    from the AppStatusStore REST API.

    Whole-application sum: a before/after delta attributes any
    concurrent or retried stage (e.g. streaming micro-batch retries)
    to the measured query (r15 ADVICE). Acceptable because the
    evidence scripts run queries strictly sequentially on an
    otherwise-idle session; a busier harness should filter stages by
    jobGroup/submissionTime instead.
    """
    app = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url, timeout=30) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteRecords", 0) for s in stages)
