"""Sources & sinks (SURVEY.md §2.1): tolerant CSV ingest, dedup-upsert
writer, synthetic generators, multimodal binary-column plumbing."""
