"""Development-time tooling (gate-churn analysis); not part of the engine
runtime surface."""
