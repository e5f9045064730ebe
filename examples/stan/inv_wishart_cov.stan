data { matrix[2,2] S0; real phi; }
parameters { cov_matrix[2] S; corr_matrix[2] R; }
model {
  S ~ inv_wishart(8, S0);
  R ~ lkj_corr(2);
}
