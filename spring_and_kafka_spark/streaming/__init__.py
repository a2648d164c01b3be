"""Structured Streaming surface (SURVEY.md §2.8): Kafka source/sink
contract, file-source replay for brokerless tests, windowed/stateful ops."""
