"""Dataset sources/sinks: clips table readers and writers (Lance with a
Parquet fallback at identical Arrow schema)."""
