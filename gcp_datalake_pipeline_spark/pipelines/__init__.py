"""The three file processors (empresa, conductor, vehiculo) as set-based
Spark batch pipelines, plus the batch runner."""
