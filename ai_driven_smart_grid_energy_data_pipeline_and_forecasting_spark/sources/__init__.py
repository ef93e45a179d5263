"""Sources: NASA POWER payload parsing and ingest orchestration."""
