// Truncated priors + GLM fused likelihood: a logistic regression whose
// intercept carries a two-sided truncated prior and whose scale
// hyperparameter uses the half-normal T[0,] idiom, with the likelihood
// in the MXU-friendly bernoulli_logit_glm form.
data {
  int<lower=1> n;
  int<lower=1> d;
  matrix[n, d] X;
  vector[n] y;
  real phi;
}
parameters {
  real alpha;
  real<lower=0> tau;
  vector[d] beta;
}
model {
  alpha ~ normal(0, 2) T[-4, 4];
  tau ~ normal(0, 1) T[0,];
  beta ~ double_exponential(0, tau);
  target += phi * bernoulli_logit_glm_lpmf(y | X, alpha, beta);
}
generated quantities {
  real p_first = Phi_approx(alpha + dot_product(X[1], beta));
}
