"""Sources & sinks: pages table, testdata tables, partitioned KG tables."""
