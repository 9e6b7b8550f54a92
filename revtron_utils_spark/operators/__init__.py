from .merge import affected_keys, delete_where, keyed_update, upsert_merge, upsert_merge_many

__all__ = ["affected_keys", "delete_where", "keyed_update", "upsert_merge", "upsert_merge_many"]
