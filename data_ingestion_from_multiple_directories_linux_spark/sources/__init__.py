"""Sources & sinks: JSON-directory file source (the reference's upload
layout), parquet table store with atomic overwrite (the engine's mutable
state), and target-schema registry."""
