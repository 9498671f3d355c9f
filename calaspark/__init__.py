"""calaspark — a PySpark-native analytics engine with the query and
data-processing capabilities of
california-civic-data-coalition/django-calaccess-raw-data, extended
with LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) and designed for 100 TB scale.

Blueprint: /root/repo/SURVEY.md (§2 operator inventory; §2.6 is the
declared correctness contract verified against a DuckDB oracle).

Reference citations use the `calaccess_raw/<path>.py §Symbol`
convention from SURVEY.md §0 (the reference mount was empty this
session; anchors are grep-able symbol names in the public repo).
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
