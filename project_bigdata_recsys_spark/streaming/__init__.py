"""Structured Streaming re-expression of the reference's Kafka
producer/consumer loop (SURVEY.md §2.10, §3.3)."""
