"""adslib — the reference's ad-library domain pipeline, Spark-first.

The reference (``/root/reference``) moves one entity — an ad — through
collect → transform → report (``main.py:13-25``). This package is that
pipeline's engine-side re-expression: the scrape stage stays an
out-of-engine edge process (SURVEY.md §1.4); everything downstream of
the raw JSON file is declarative DataFrame transformations.

Modules:
* ``schemas``   — raw ad-group / curated / report StructTypes
* ``transform`` — raw JSON → validated, deduplicated curated table
* ``report``    — curated table → top-10 active-ads report
"""
