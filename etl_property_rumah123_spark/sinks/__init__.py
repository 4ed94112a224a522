"""Sinks: JDBC staging + transactional merge, dated file writers."""
