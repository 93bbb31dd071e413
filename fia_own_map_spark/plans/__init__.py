"""Job plans: the three-stage ER pipeline and its driver entry points."""
