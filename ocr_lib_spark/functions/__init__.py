"""Reusable column-level functions (JVM-side, codegen-friendly)."""
