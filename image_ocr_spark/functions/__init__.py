"""Native Spark SQL column builders mirroring pycore semantics exactly."""
