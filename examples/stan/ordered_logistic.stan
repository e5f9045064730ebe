data { int N; int y[N]; vector[N] x; real phi; }
parameters { real beta; ordered[2] c; }
model {
  beta ~ normal(0, 2);
  c ~ normal(0, 5);
  for (n in 1:N) { y[n] ~ ordered_logistic(beta * x[n], c); }
}
