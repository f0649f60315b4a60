"""Driver-facing pipelines over the test tables (queries()/oracle_sql())."""
