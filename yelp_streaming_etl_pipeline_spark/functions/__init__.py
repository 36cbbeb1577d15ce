"""Pure-Column expression library (JVM-side, whole-stage-codegen'd)."""
