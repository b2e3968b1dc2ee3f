"""Design-record intersector architectures, kept for their oracle tests
and measured lessons (DESIGN.md "intersection architectures") but not on
any production dispatch path. Production accels live in ops/: cellserve
(TPU default), bvh_xla (CPU), bvh_serve / bvh_tiled / grid (selectable
via MI3T_ACCEL)."""
