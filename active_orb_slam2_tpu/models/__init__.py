"""SLAM pipeline models (L1 map core + L3 estimation + L4 pipeline + L5 API).

The reference's pointer-graph of Frame/KeyFrame/MapPoint/Map objects
(``src/{Frame,KeyFrame,MapPoint,Map}.cc`` [U]) becomes one fixed-shape
SoA arena pytree (``MapState``); its four OS threads become jitted steps
driven by a host orchestrator (``System``).
"""
