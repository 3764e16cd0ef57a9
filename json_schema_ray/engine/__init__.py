"""Ray Data data-plane stages for json_schema_ray."""
