from .writers import (
    append,
    idempotent_append,
    idempotent_append_df,
    merge_upsert,
    merge_upsert_df,
)

__all__ = [
    "append",
    "idempotent_append",
    "idempotent_append_df",
    "merge_upsert",
    "merge_upsert_df",
]
