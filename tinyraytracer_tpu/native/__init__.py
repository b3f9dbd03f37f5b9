"""Native C++ runtime components (BVH builder, PNG encoder) via ctypes."""
