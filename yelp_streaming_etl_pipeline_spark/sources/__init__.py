"""Sources & sinks: JSON-lines review reader, synthetic-review
derivation over the driver fixtures, Kafka wrappers, JDBC upsert."""
