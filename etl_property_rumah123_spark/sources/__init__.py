"""Sources: testdata catalog, the rate-limited paginated listing source,
and HTML-card parsing expressed as column expressions."""
