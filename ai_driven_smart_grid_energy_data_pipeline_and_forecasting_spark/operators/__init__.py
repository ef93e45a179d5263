"""Engine operators: relational primitives, dedup family, similarity
search, upsert/merge sinks, as-of join."""
