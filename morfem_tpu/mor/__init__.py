"""Model-order-reduction engine: basis builders, error estimator,
projection and the reduced sweep."""
