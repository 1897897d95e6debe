"""Query/operator registry: each module exposes QUERIES = {name: (builder,
duckdb_sql_or_None)}; builders take (spark, sf_dir) → DataFrame."""

from . import dedup, multimodal, relational, similarity, text


def all_queries() -> dict:
    out = {}
    for mod in (text, dedup, similarity, relational, multimodal):
        for name, (builder, sql) in mod.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            # lazy oracles: a callable SQL entry is resolved here (used by
            # multimodal, whose SQL embeds the materialized fixture path)
            out[name] = (builder, sql() if callable(sql) else sql)
    return out
