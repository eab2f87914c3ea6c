"""Dump .explain("formatted") for every registered query to
plans/<tag>/<name>_<suffix>.txt and write a machine-readable audit
(Exchange count, join strategies, Python-eval nodes, pushed filters)
to plans/<tag>/_audit_<suffix>.json.

Usage:
    python scripts/plan_dump.py r16 before [only_names...]

Notes:
- fn(spark, sf_dir) is executed to BUILD the DataFrame (streaming
  queries run their stream as a side effect, same as the bench), but
  the plan itself is captured without materializing the result.
- Queries whose fn raises are recorded with the error text so the
  audit stays total.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark


def audit_plan(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "exchange_kinds": sorted(set(re.findall(r"Exchange (\w+)", text))),
        "joins": sorted(set(re.findall(r"\b(\w*Join\w*)\b", text)) - {"Join"}),
        "python_eval": sorted(
            set(
                re.findall(
                    r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
                    r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|"
                    r"FlatMapGroupsInArrow|PythonMapInArrow|AggregateInPandas)\b",
                    text,
                )
            )
        ),
        "cartesian": "CartesianProduct" in text,
        "pushed_filters_empty": bool(re.search(r"PushedFilters: \[\]", text)),
        "has_pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", text)),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text))),
        "sorts": len(re.findall(r"^\s*\+?-? ?\*?\(?\d*\)? ?Sort ", text, re.M)),
        "take_ordered": "TakeOrderedAndProject" in text,
        "bytes": len(text),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan_dump")
    registry = load_all()
    audit: dict[str, dict] = {}
    for i, (name, q) in enumerate(sorted(registry.items())):
        if only and name not in only:
            continue
        if i % 15 == 0:
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"plan_dump: {name}")
        try:
            df = q.fn(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep the audit total
            text = f"ERROR building plan: {e}"
            audit[name] = {"error": str(e)[:500]}
        else:
            audit[name] = audit_plan(text)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        spark.sparkContext.setJobDescription(None)
    with open(os.path.join(out_dir, f"_audit_{suffix}.json"), "w") as f:
        json.dump(audit, f, indent=1, sort_keys=True)
    print(f"wrote {len(audit)} plans to {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
