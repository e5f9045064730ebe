data { vector[3] a; real phi; }
parameters { real z; }
model { z ~ normal(0, 1); }
generated quantities { vector[3] w = dirichlet_rng(a); int c = categorical_rng(a); }
