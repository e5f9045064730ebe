data {
  int<lower=1> N; int<lower=1> J;
  array[N] int<lower=1, upper=J> county;
  vector[N] x; vector[N] y; real phi;
}
parameters {
  vector[J] a; real b; real mu_a;
  real<lower=0> sigma_a; real<lower=0> sigma_y;
}
model {
  mu_a ~ normal(0, 1);
  sigma_a ~ cauchy(0, 2.5) T[0,];
  sigma_y ~ cauchy(0, 2.5) T[0,];
  a ~ normal(mu_a, sigma_a);
  target += phi * normal_lpdf(y | a[county] + b * x, sigma_y);
}
