from .engine import ScdConfig, apply_scd, SYSTEM_COLUMNS

__all__ = ["ScdConfig", "apply_scd", "SYSTEM_COLUMNS"]
