"""DataFrame -> DataFrame operators: routing, projection, aggregation,
dedup, similarity, text analysis."""
