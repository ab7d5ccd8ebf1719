"""Pipeline compositions, CLI dispatch, and the driver-facing query
registry over the synthetic test tables."""
