"""Query plans: the driver-contract catalog lives in driver_queries."""
