"""Input connectors: Kafka source/sink wrappers and JSON serdes (SURVEY
S1-S4), file-based streaming sources for broker-less testing, synthetic
record generators (S9-S11), and the JDBC upsert sink / incremental source
(S7/S8)."""
