"""Task models (registry extension point ``get_model``): the thin layer
binding pipelines to the driver's batch protocol."""
