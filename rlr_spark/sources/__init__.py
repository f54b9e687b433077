"""Sources & sinks: schema-explicit readers, review-packet config, writers."""
