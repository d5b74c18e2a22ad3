"""Sources: deterministic fixture generators + rate-controlled streaming reads."""
