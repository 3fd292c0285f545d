"""CloudWatch series allowlist (reference allowlist.go:8-10).

Kept tiny and broadcast-friendly: at any scale this is an `isin`
literal folded into the projection, never a join.
"""

CLOUDWATCH_ALLOWLIST: frozenset[str] = frozenset({"ContainerExitCount"})
