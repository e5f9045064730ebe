data { matrix[2,2] S0; vector[2] mu0; real phi; }
parameters { vector[2] x; }
model { x ~ multi_student_t(5, mu0, S0); }
