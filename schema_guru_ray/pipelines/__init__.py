"""End-to-end Ray Data pipelines: schema inference, constraint validation,
profiling. All are lazy Dataset graphs; nothing materializes the full input."""
