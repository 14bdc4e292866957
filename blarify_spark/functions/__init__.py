"""Column-level function library: Arrow/pandas UDFs + native expressions."""
