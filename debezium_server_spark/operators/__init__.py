"""Pipeline operators: envelope extraction, SMTs, predicates, routing,
materialization, partitioning, and the LLM-data-pipeline extensions
(dedup, similarity, text analysis, multimodal)."""
