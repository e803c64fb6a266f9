"""Sources: bronze CSV reader, filename router, ingestion manifest."""
