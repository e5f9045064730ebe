// Wide-D wild model: IRT with AR(1) ability drift (VERDICT r4 #6).
// D = J + 4 = 64 unconstrained parameters PLUS a carried recurrence over
// T = 120 responses — the shape that excluded wide models from the fast
// Pallas path while the forward-mode tile adapter was capped at D <= 24.
// Each item difficulty b[j] touches only its own ~T/J observations (a
// sparse tangent cone), while rho/mu/theta0 ride the recurrence.
data {
  int<lower=1> T;
  int<lower=1> J;
  array[T] int<lower=0, upper=1> y;
  array[T] int<lower=1, upper=J> item;
  real<lower=0, upper=1> phi;
}
parameters {
  vector[J] b;
  real rho;
  real mu;
  real theta0;
  real<lower=0> sigma_b;
}
model {
  b ~ normal(0, sigma_b);
  sigma_b ~ normal(0, 1);
  rho ~ normal(0, 1);
  mu ~ normal(0, 1);
  theta0 ~ normal(0, 1);
  real th = theta0;
  for (t in 1 : T) {
    th = mu + rho * th;
    target += phi * bernoulli_logit_lpmf(y[t] | th - b[item[t]]);
  }
}
