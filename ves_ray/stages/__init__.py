"""Operator stages — each a vectorized ``map_batches`` transform.

Stateless transforms are plain functions (Ray task pool); stateful
transforms (broadcast lookups, models, indexes) are callable classes
(Ray actor pool, setup once per actor in ``__init__``).
"""
