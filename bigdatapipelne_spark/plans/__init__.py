"""Pipeline plans: the medallion (raw -> stage -> spec) card pipeline and
the in-process orchestrator that replaces the reference's Step Functions /
DDK DataPipeline chaining (ddk_app/custom/historical.py:443-449)."""
