"""Sources: transcript tables, edge-list files, seeded graph generators."""
