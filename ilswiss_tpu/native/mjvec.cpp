// mjvec: native vectorized MuJoCo engine (envpool-style).
//
// The framework's C++ replacement for the reference's external native
// dependencies (envpool's C++ batched env engine / mujoco-py; SURVEY.md
// §2.4): B MuJoCo env instances stepped in one call over persistent
// worker stripes, with gymnasium-v5-exact observation/reward/termination
// semantics for the locomotion family and immediate autoreset.  The
// Python side (envs/native_mujoco.py) binds via ctypes — no pybind11.
//
// Semantics mirrored from gymnasium (verified against the installed
// sources, see tests/test_native_mujoco.py):
//   hopper_v5.py:    obs = [qpos[1:], clip(qvel, ±10)]; reward =
//                    x_vel + healthy - 1e-3*|a|²; healthy: z>0.7,
//                    |angle|<0.2, state[2:] in ±100; frame_skip 4
//   walker2d_v5.py:  same obs; healthy: 0.8<z<2.0, |angle|<1; skip 4
//   half_cheetah_v5: obs = [qpos[1:], qvel]; reward = x_vel - 0.1*|a|²;
//                    never terminates; frame_skip 5; reset noise:
//                    qpos uniform(±.1), qvel N(0,.1)
//
// Build: see envs/native_mujoco.py (g++ -O3 -shared, links the wheel's
// libmujoco).

#include <mujoco/mujoco.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

enum EnvType { HOPPER = 0, WALKER2D = 1, HALFCHEETAH = 2 };

struct VecEnv {
  mjModel* model = nullptr;
  std::vector<mjData*> data;
  int n = 0;
  int env_type = 0;
  int frame_skip = 4;
  int max_steps = 1000;
  double dt = 0.0;
  int nq = 0, nv = 0, nu = 0, obs_dim = 0;
  std::vector<double> init_qpos, init_qvel;
  std::vector<std::mt19937> rng;
  std::vector<int> step_count;

  // persistent worker pool
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  int generation = 0;
  int pending = 0;
  bool shutdown = false;
  const float* cur_actions = nullptr;
  float* out_true_next = nullptr;
  float* out_reward = nullptr;
  uint8_t* out_terminal = nullptr;
  uint8_t* out_done = nullptr;
  float* out_obs_after = nullptr;
};

double reset_noise_scale(const VecEnv* env) {
  return env->env_type == HALFCHEETAH ? 0.1 : 5e-3;
}

void write_obs(const VecEnv* env, int i, float* out) {
  const mjData* d = env->data[i];
  int k = 0;
  for (int j = 1; j < env->nq; ++j) out[k++] = (float)d->qpos[j];
  for (int j = 0; j < env->nv; ++j) {
    double v = d->qvel[j];
    if (env->env_type != HALFCHEETAH) {
      v = v < -10.0 ? -10.0 : (v > 10.0 ? 10.0 : v);
    }
    out[k++] = (float)v;
  }
}

bool is_healthy(const VecEnv* env, int i) {
  const mjData* d = env->data[i];
  if (env->env_type == HALFCHEETAH) return true;
  double z = d->qpos[1];
  double angle = d->qpos[2];
  if (env->env_type == HOPPER) {
    // state_vector()[2:] = qpos[2:] + qvel, all within ±100
    for (int j = 2; j < env->nq; ++j)
      if (!(std::fabs(d->qpos[j]) < 100.0)) return false;
    for (int j = 0; j < env->nv; ++j)
      if (!(std::fabs(d->qvel[j]) < 100.0)) return false;
    return z > 0.7 && std::fabs(angle) < 0.2;
  }
  // walker2d
  return z > 0.8 && z < 2.0 && angle > -1.0 && angle < 1.0;
}

void reset_one(VecEnv* env, int i) {
  mjData* d = env->data[i];
  mj_resetData(env->model, d);
  double s = reset_noise_scale(env);
  std::uniform_real_distribution<double> uni(-s, s);
  std::normal_distribution<double> normal(0.0, 1.0);
  auto& gen = env->rng[i];
  for (int j = 0; j < env->nq; ++j)
    d->qpos[j] = env->init_qpos[j] + uni(gen);
  if (env->env_type == HALFCHEETAH) {
    for (int j = 0; j < env->nv; ++j)
      d->qvel[j] = env->init_qvel[j] + s * normal(gen);
  } else {
    for (int j = 0; j < env->nv; ++j)
      d->qvel[j] = env->init_qvel[j] + uni(gen);
  }
  mj_forward(env->model, d);
  env->step_count[i] = 0;
}

void step_one(VecEnv* env, int i) {
  mjData* d = env->data[i];
  const float* a = env->cur_actions + (size_t)i * env->nu;
  double x_before = d->qpos[0];
  for (int j = 0; j < env->nu; ++j) {
    // normalized [-1,1] -> ctrlrange (gym action space == ctrlrange)
    double lo = env->model->actuator_ctrlrange[2 * j];
    double hi = env->model->actuator_ctrlrange[2 * j + 1];
    double act = lo + (a[j] + 1.0) * 0.5 * (hi - lo);
    act = act < lo ? lo : (act > hi ? hi : act);
    d->ctrl[j] = act;
  }
  for (int s = 0; s < env->frame_skip; ++s) mj_step(env->model, d);
  double x_after = d->qpos[0];
  double x_vel = (x_after - x_before) / env->dt;

  double ctrl_cost_w = env->env_type == HALFCHEETAH ? 0.1 : 1e-3;
  double ctrl_cost = 0.0;
  for (int j = 0; j < env->nu; ++j) ctrl_cost += d->ctrl[j] * d->ctrl[j];
  ctrl_cost *= ctrl_cost_w;

  bool healthy = is_healthy(env, i);
  double healthy_reward =
      (env->env_type == HALFCHEETAH) ? 0.0 : (healthy ? 1.0 : 0.0);
  double reward = x_vel + healthy_reward - ctrl_cost;

  bool terminal = (env->env_type != HALFCHEETAH) && !healthy;
  env->step_count[i] += 1;
  bool truncated = env->step_count[i] >= env->max_steps && !terminal;
  bool done = terminal || truncated;

  write_obs(env, i, env->out_true_next + (size_t)i * env->obs_dim);
  env->out_reward[i] = (float)reward;
  env->out_terminal[i] = terminal ? 1 : 0;
  env->out_done[i] = done ? 1 : 0;
  if (done) reset_one(env, i);
  write_obs(env, i, env->out_obs_after + (size_t)i * env->obs_dim);
}

void worker_loop(VecEnv* env, int begin, int end) {
  int seen = 0;
  for (;;) {
    {
      std::unique_lock<std::mutex> lk(env->mu);
      env->cv_work.wait(lk, [&] {
        return env->shutdown || env->generation > seen;
      });
      if (env->shutdown) return;
      seen = env->generation;
    }
    for (int i = begin; i < end; ++i) step_one(env, i);
    {
      std::lock_guard<std::mutex> lk(env->mu);
      if (--env->pending == 0) env->cv_done.notify_one();
    }
  }
}

}  // namespace

extern "C" {

void* mjvec_create(const char* xml_path, int n, int env_type,
                   int frame_skip, int max_steps, unsigned seed,
                   int num_threads) {
  char error[512];
  mjModel* model = mj_loadXML(xml_path, nullptr, error, sizeof(error));
  if (!model) return nullptr;

  auto* env = new VecEnv;
  env->model = model;
  env->n = n;
  env->env_type = env_type;
  env->frame_skip = frame_skip;
  env->max_steps = max_steps;
  env->dt = model->opt.timestep * frame_skip;
  env->nq = model->nq;
  env->nv = model->nv;
  env->nu = model->nu;
  env->obs_dim = (model->nq - 1) + model->nv;
  env->init_qpos.assign(model->qpos0, model->qpos0 + model->nq);
  env->init_qvel.assign(model->nv, 0.0);

  std::mt19937 seeder(seed);
  for (int i = 0; i < n; ++i) {
    env->data.push_back(mj_makeData(model));
    env->rng.emplace_back(seeder());
    env->step_count.push_back(0);
  }
  for (int i = 0; i < n; ++i) reset_one(env, i);

  int nthreads = num_threads < 1 ? 1 : (num_threads > n ? n : num_threads);
  int per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int b = t * per, e = b + per > n ? n : b + per;
    if (b >= e) break;
    env->workers.emplace_back(worker_loop, env, b, e);
  }
  return env;
}

int mjvec_obs_dim(void* h) { return ((VecEnv*)h)->obs_dim; }
int mjvec_act_dim(void* h) { return ((VecEnv*)h)->nu; }

void mjvec_reset_all(void* h, float* obs_out) {
  auto* env = (VecEnv*)h;
  for (int i = 0; i < env->n; ++i) {
    reset_one(env, i);
    write_obs(env, i, obs_out + (size_t)i * env->obs_dim);
  }
}

void mjvec_get_obs(void* h, float* obs_out) {
  auto* env = (VecEnv*)h;
  for (int i = 0; i < env->n; ++i)
    write_obs(env, i, obs_out + (size_t)i * env->obs_dim);
}

void mjvec_set_state(void* h, int i, const double* qpos,
                     const double* qvel) {
  auto* env = (VecEnv*)h;
  mjData* d = env->data[i];
  std::memcpy(d->qpos, qpos, sizeof(double) * env->nq);
  std::memcpy(d->qvel, qvel, sizeof(double) * env->nv);
  mj_forward(env->model, d);
}

void mjvec_step(void* h, const float* actions, float* true_next_obs,
                float* reward, uint8_t* terminal, uint8_t* done,
                float* obs_after) {
  auto* env = (VecEnv*)h;
  {
    std::lock_guard<std::mutex> lk(env->mu);
    env->cur_actions = actions;
    env->out_true_next = true_next_obs;
    env->out_reward = reward;
    env->out_terminal = terminal;
    env->out_done = done;
    env->out_obs_after = obs_after;
    env->pending = (int)env->workers.size();
    env->generation += 1;
  }
  env->cv_work.notify_all();
  {
    std::unique_lock<std::mutex> lk(env->mu);
    env->cv_done.wait(lk, [&] { return env->pending == 0; });
  }
}

void mjvec_destroy(void* h) {
  auto* env = (VecEnv*)h;
  {
    std::lock_guard<std::mutex> lk(env->mu);
    env->shutdown = true;
  }
  env->cv_work.notify_all();
  for (auto& t : env->workers) t.join();
  for (auto* d : env->data) mj_deleteData(d);
  mj_deleteModel(env->model);
  delete env;
}

}  // extern "C"
